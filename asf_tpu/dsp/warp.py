"""Sparse image warp (polyharmonic spline + bilinear dense warp), jittable.

TPU-native re-expression of the reference's torch port of TF's
``sparse_image_warp`` (/root/reference/audio_slowfast/datasets/sparse_image_warp.py:5-354),
used by SpecAugment's time-warp. Differences, by design:

  * The reference stabilises its singular 1-control-point system by adding
    random noise to the matrix (sparse_image_warp.py:113-115: "Pytorch gesv
    fails with zeros"), making its flow field nondeterministic. Here the
    system gets a deterministic ridge term instead — same interpolation
    family, reproducible, and differentiable.
  * Everything is static-shape jittable (fori-free; one small linear solve
    plus two GEMMs) so it fuses into the training step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _phi(r2: jnp.ndarray, order: int = 2) -> jnp.ndarray:
    """Polyharmonic radial basis on squared distances (order 2: 1/2 r^2 log r^2)."""
    eps = 1e-10
    if order == 1:
        return jnp.sqrt(jnp.maximum(r2, eps))
    if order == 2:
        return 0.5 * r2 * jnp.log(jnp.maximum(r2, eps))
    if order == 4:
        return 0.5 * jnp.square(r2) * jnp.log(jnp.maximum(r2, eps))
    if order % 2 == 0:
        r2c = jnp.maximum(r2, eps)
        return 0.5 * jnp.power(r2c, 0.5 * order) * jnp.log(r2c)
    return jnp.power(jnp.maximum(r2, eps), 0.5 * order)


def _cross_sq_dists(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(n, d), (m, d) -> (n, m) pairwise squared distances."""
    xn = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    yn = jnp.sum(jnp.square(y), axis=-1, keepdims=True)
    return xn - 2.0 * (x @ y.T) + yn.T


def interpolate_spline(
    train_points: jnp.ndarray,  # (n, 2)
    train_values: jnp.ndarray,  # (n, k)
    query_points: jnp.ndarray,  # (m, 2)
    order: int = 2,
    regularization: float = 1e-6,
) -> jnp.ndarray:
    """Fit a polyharmonic spline to (points -> values) and evaluate at queries."""
    n, d = train_points.shape
    k = train_values.shape[-1]
    a = _phi(_cross_sq_dists(train_points, train_points), order)  # (n, n)
    ones = jnp.ones((n, 1), train_points.dtype)
    b = jnp.concatenate([train_points, ones], axis=1)  # (n, d+1)

    if n == 1:
        # SpecAugment's case (one control point): the ridged KKT system
        #   [[a+r, b],[b^T, r·I]] [w; v] = [val; 0]
        # solves in closed form by block elimination — v = -(w/r)·b^T from
        # the bottom rows, then w = val / (a + r − |b|²/r). Exact same
        # algebra the LU factorisation performs, but elementwise: the
        # batched 4×4 `LuDecompositionBlock` custom-call + triangular
        # solves cost ~230 µs/step of the K-scanned train dispatch
        # (PROFILE.md §1b) and serialise on the VPU; this fuses to nothing.
        r = jnp.asarray(regularization, a.dtype)
        b1 = b[0]  # (d+1,)
        denom = a[0, 0] + r - jnp.sum(jnp.square(b1)) / r
        w = train_values / denom  # (1, k)
        v = (-w / r) * b1[:, None]  # (d+1, k)
    else:
        lhs_top = jnp.concatenate([a, b], axis=1)  # (n, n+d+1)
        lhs_bot = jnp.concatenate(
            [b.T, jnp.zeros((d + 1, d + 1), a.dtype)], axis=1
        )
        lhs = jnp.concatenate([lhs_top, lhs_bot], axis=0)
        lhs = lhs + regularization * jnp.eye(n + d + 1, dtype=a.dtype)
        rhs = jnp.concatenate(
            [train_values, jnp.zeros((d + 1, k), a.dtype)], axis=0
        )
        coeffs = jnp.linalg.solve(lhs, rhs)
        w, v = coeffs[:n], coeffs[n:]

    q_phi = _phi(_cross_sq_dists(query_points, train_points), order)  # (m, n)
    q_aug = jnp.concatenate(
        [query_points, jnp.ones((query_points.shape[0], 1), a.dtype)], axis=1
    )
    return q_phi @ w + q_aug @ v  # (m, k)


def interpolate_bilinear(grid: jnp.ndarray, query_points: jnp.ndarray) -> jnp.ndarray:
    """(H, W) image, (m, 2) float (y, x) queries -> (m,) bilinear samples.

    Edge behaviour matches the reference port (sparse_image_warp.py:264-354):
    floors clamped to [0, size-2], alphas clamped to [0, 1].
    """
    h, w = grid.shape
    qy, qx = query_points[:, 0], query_points[:, 1]

    fy = jnp.clip(jnp.floor(qy), 0.0, h - 2.0)
    fx = jnp.clip(jnp.floor(qx), 0.0, w - 2.0)
    ay = jnp.clip(qy - fy, 0.0, 1.0)
    ax = jnp.clip(qx - fx, 0.0, 1.0)
    iy, ix = fy.astype(jnp.int32), fx.astype(jnp.int32)

    tl = grid[iy, ix]
    tr = grid[iy, ix + 1]
    bl = grid[iy + 1, ix]
    br = grid[iy + 1, ix + 1]

    top = tl + ax * (tr - tl)
    bot = bl + ax * (br - bl)
    return top + ay * (bot - top)


def sparse_image_warp(
    image: jnp.ndarray,  # (H, W)
    src_points: jnp.ndarray,  # (n, 2) (y, x)
    dst_points: jnp.ndarray,  # (n, 2)
    order: int = 2,
    regularization: float = 1e-6,
) -> jnp.ndarray:
    """Warp a single-channel image so pixels at dst move like src->dst flow.

    output[y, x] = image[(y, x) - flow(y, x)] with flow interpolated from the
    control-point flows by a polyharmonic spline (TF semantics: flows are
    interpolated at *dst* locations).
    """
    h, w = image.shape
    grid_y, grid_x = jnp.meshgrid(
        jnp.arange(h, dtype=image.dtype), jnp.arange(w, dtype=image.dtype), indexing="ij"
    )
    queries = jnp.stack([grid_y.reshape(-1), grid_x.reshape(-1)], axis=1)  # (H*W, 2)
    dense_flow = interpolate_spline(
        dst_points.astype(image.dtype),
        (dst_points - src_points).astype(image.dtype),
        queries,
        order,
        regularization,
    )  # (H*W, 2)
    sample_at = queries - dense_flow
    return interpolate_bilinear(image, sample_at).reshape(h, w)


def warp_time_taps(image: jnp.ndarray, sample_x: jnp.ndarray, max_shift: int) -> jnp.ndarray:
    """Row-wise 1-D linear resample via windowed taps — gather-free.

    ``out[y, x] = interp(image[y, :], sample_x[y, x])`` assuming
    ``|sample_x - x| <= max_shift`` (true for SpecAugment's time warp: the
    spline flow is affine for a single control point and bounded by ~2.5 W).
    TPU gathers serialize on the VPU (the 2-D bilinear gather made
    SpecAugment cost 135 ms / 64-clip batch on v5e); 2*max_shift+1 shifted
    adds are pure vector ops (~1 ms).
    """
    f, t = image.shape
    s = jnp.clip(sample_x, 0.0, t - 1.0)
    x = jax.lax.broadcasted_iota(image.dtype, (f, t), 1)
    padded = jnp.pad(image, ((0, 0), (max_shift, max_shift)))
    out = jnp.zeros_like(image)
    for k in range(-max_shift, max_shift + 1):
        w = jnp.maximum(0.0, 1.0 - jnp.abs((x + k) - s))
        col = jax.lax.dynamic_slice_in_dim(padded, max_shift + k, t, axis=1)
        out = out + w * col
    return out


def sparse_image_warp_time(
    image: jnp.ndarray,  # (H, W)
    src_points: jnp.ndarray,  # (n, 2) (y, x) — y components equal to dst's
    dst_points: jnp.ndarray,
    max_shift: int,
    order: int = 2,
    regularization: float = 1e-6,
) -> jnp.ndarray:
    """sparse_image_warp specialised to x-only displacements with a known
    bound: identical output, no gathers."""
    h, w = image.shape
    grid_y, grid_x = jnp.meshgrid(
        jnp.arange(h, dtype=image.dtype), jnp.arange(w, dtype=image.dtype), indexing="ij"
    )
    queries = jnp.stack([grid_y.reshape(-1), grid_x.reshape(-1)], axis=1)
    dense_flow = interpolate_spline(
        dst_points.astype(image.dtype),
        (dst_points - src_points).astype(image.dtype),
        queries,
        order,
        regularization,
    )  # (H*W, 2); the y column is exactly zero (zero training values)
    sample_x = grid_x - dense_flow[:, 1].reshape(h, w)
    return warp_time_taps(image, sample_x, max_shift)
