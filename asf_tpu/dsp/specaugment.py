"""SpecAugment (time-warp + freq/time masks), key-threaded and jittable.

Parity target: /root/reference/audio_slowfast/datasets/spec_augment.py:9-191,
which the reference applies per-sample on the host in DataLoader workers.
Here it runs on-device inside the jitted step, vmapped over the batch, fusing
with the log-mel front end.

Faithfully reproduced semantics:
  * pipeline order: time_warp -> 2x freq_mask -> 2x time_mask (spec_augment:144-191)
  * mask widths: width ~ U[0, F), start ~ U[0, n_mels - width),
    end ~ U[start, start + width) — i.e. the *effective* mask is
    [start, end) with end < start + width (spec_augment:79-92)
  * masks are filled with the mean of the CURRENT spectrogram, so the second
    mask's fill value includes the first mask (sequential mean, :91)
  * the early-return quirk: a zero-width draw aborts the remaining masks of
    that stage (:84-85,:133-134)
  * the time-warp control point: the reference indexes a random time position
    and uses the spectrogram VALUE there as the x coordinate
    (spec_augment.py:35-43 — the well-known SpecAugment-pytorch port bug).
    ``faithful_warp_bug=True`` (default) reproduces that; ``False`` uses the
    sampled position itself, i.e. the SpecAugment paper's intent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .warp import sparse_image_warp_time


def _mask_axis(key, spec, max_width: int, axis: int, alive):
    """One mask along ``axis`` of a (T, F) spec, mean-filled; returns
    (masked_spec, still_alive)."""
    k1, k2, k3 = jax.random.split(key, 3)
    size = spec.shape[axis]
    width = jax.random.randint(k1, (), 0, max_width)  # [0, max_width)
    start = jax.random.randint(k2, (), 0, jnp.maximum(size - width, 1))
    end = jax.random.randint(k3, (), start, jnp.maximum(start + width, start + 1))

    idx = jax.lax.broadcasted_iota(jnp.int32, spec.shape, axis)
    in_mask = (idx >= start) & (idx < end) & alive & (width > 0)
    fill = jnp.mean(spec)
    out = jnp.where(in_mask, fill, spec)
    return out, alive & (width > 0)


def _time_warp_single(key, spec, w_param: int, faithful_bug: bool):
    """(T, F) spec -> warped along time. The reference warps the (F, T)
    image (spec permuted) with one control point at y = F // 2."""
    t_len, n_mels = spec.shape
    img = spec.T  # (F, T) to mirror the reference's geometry
    y = n_mels // 2
    k1, k2 = jax.random.split(key)
    pos = jax.random.randint(k1, (), w_param, t_len - w_param)
    if faithful_bug:
        # Reference uses the spectrogram VALUE as the x coordinate.
        x_coord = img[y, pos]
    else:
        x_coord = pos.astype(spec.dtype)
    dist = jax.random.randint(k2, (), -w_param, w_param).astype(spec.dtype)
    src = jnp.stack([jnp.full((), y, spec.dtype), x_coord.astype(spec.dtype)]).reshape(1, 2)
    dst = src + jnp.stack([jnp.zeros((), spec.dtype), dist]).reshape(1, 2)
    # Gather-free specialisation (x-only displacement, bounded flow): same
    # output as sparse_image_warp to float32 noise, ~100x faster on TPU
    # (the 2-D bilinear gather serializes on the VPU).
    warped = sparse_image_warp_time(img, src, dst, max_shift=3 * w_param + 2)
    return warped.T


def spec_augment_single(
    key,
    spec: jnp.ndarray,  # (T, F)
    num_freq_masks: int = 2,
    num_time_masks: int = 2,
    freq_mask_param: int = 27,
    time_mask_param: int = 25,
    warp_param: int = 5,
    enable_warp: bool = True,
    faithful_warp_bug: bool = True,
) -> jnp.ndarray:
    keys = jax.random.split(key, 1 + num_freq_masks + num_time_masks)
    if enable_warp and spec.shape[0] > 2 * warp_param:
        spec = _time_warp_single(keys[0], spec, warp_param, faithful_warp_bug)

    alive = jnp.bool_(True)
    for i in range(num_freq_masks):
        spec, alive = _mask_axis(keys[1 + i], spec, freq_mask_param, axis=1, alive=alive)
    alive = jnp.bool_(True)
    for i in range(num_time_masks):
        spec, alive = _mask_axis(
            keys[1 + num_freq_masks + i], spec, time_mask_param, axis=0, alive=alive
        )
    return spec


def spec_augment_batch(key, specs: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """(B, T, F) batched SpecAugment with per-sample keys (vmapped)."""
    keys = jax.random.split(key, specs.shape[0])
    fn = partial(spec_augment_single, **kwargs)
    return jax.vmap(fn)(keys, specs)
