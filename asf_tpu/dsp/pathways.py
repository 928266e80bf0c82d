"""Slow/Fast pathway packing (on-device).

Parity with ``pack_pathway_output``
(/root/reference/audio_slowfast/datasets/utils.py:43-72): the Fast pathway is
the full (T, F) spectrogram; the Slow pathway subsamples T//ALPHA frames at
indices ``floor(linspace(0, T-1, T//ALPHA))`` (torch ``linspace(...).long()``
truncates toward zero).

TPU layout: spectrogram batches are channels-last (B, T, F, C) so convs hit
XLA's native NHWC path.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def slow_indices(num_frames: int, alpha: int) -> np.ndarray:
    """``torch.linspace(0, T-1, T//alpha).long()`` — BIT-exact emulation.

    float64 np.linspace truncates differently from torch at 611 of the
    (T<=2048, alpha in {2,4,5,8}) geometries — including T=400 at the
    defaults.py ALPHA=8 — so the slow pathway would gather different frames
    than the reference. torch's CPU linspace (ATen RangeFactories) fills
    SYMMETRICALLY: the first half as ``start + i*step``, the second as
    ``end - (steps-1-i)*step``, with a float32 step and FMA contraction
    (i.e. the i*step product is not rounded to float32 before the add).
    Emulated here with a float32 step and double-precision products (exact
    for these magnitudes, matching FMA's single rounding); verified equal to
    torch over T in [2, 4096], alpha in [2, 16] (tests/test_dsp.py)."""
    n = num_frames // alpha
    if n <= 1:
        return np.zeros(max(n, 0), np.int64)
    step = np.float64(np.float32(np.float32(num_frames - 1) / np.float32(n - 1)))
    i = np.arange(n, dtype=np.float64)
    half = n // 2
    vals = np.empty(n, np.float32)
    vals[:half] = (i[:half] * step).astype(np.float32)
    vals[half:] = (
        np.float64(num_frames - 1) - (n - 1 - i[half:]) * step
    ).astype(np.float32)
    return vals.astype(np.int64)


def pack_pathways(cfg, spectrogram: jnp.ndarray):
    """(..., T, F[, C]) spectrogram -> list of pathway tensors.

    Single-pathway archs return [spec]; slowfast returns [slow, fast] where
    slow gathers ``slow_indices`` along the time axis.
    """
    arch = cfg.MODEL.ARCH
    if arch in cfg.MODEL.SINGLE_PATHWAY_ARCH:
        return [spectrogram]
    if arch in cfg.MODEL.MULTI_PATHWAY_ARCH:
        # Canonical layouts: (B, T, F), (B, T, F, C) or (B, N, T, F, C).
        if spectrogram.ndim >= 3 and spectrogram.shape[-1] <= 4:
            t_axis = spectrogram.ndim - 3
        else:
            t_axis = spectrogram.ndim - 2
        num_frames = spectrogram.shape[t_axis]
        idx = jnp.asarray(slow_indices(num_frames, cfg.SLOWFAST.ALPHA))
        slow = jnp.take(spectrogram, idx, axis=t_axis)
        return [slow, spectrogram]
    raise NotImplementedError(
        f"Model arch {arch} is not in "
        f"{cfg.MODEL.SINGLE_PATHWAY_ARCH + cfg.MODEL.MULTI_PATHWAY_ARCH}"
    )
