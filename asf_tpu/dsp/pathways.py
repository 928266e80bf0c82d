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
    """floor(linspace(0, T-1, T//alpha)) — torch .long() truncation parity."""
    n = num_frames // alpha
    return np.linspace(0, num_frames - 1, n).astype(np.int64)


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
