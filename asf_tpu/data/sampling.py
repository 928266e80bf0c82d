"""Clip sampling (host-side).

Parity with ``get_start_end_idx`` (/root/reference/audio_slowfast/datasets/utils.py:12-40):
train (clip_idx == -1) samples a uniform-random start in [0, delta]; test
picks linspace(0, delta, num_clips)[clip_idx]. end = start + clip_size - 1,
and slices are python-style [start, end) — i.e. clips carry clip_size - 1
samples, which sets the spectrogram frame geometry (see dsp/logmel.py).
"""

from __future__ import annotations

import numpy as np


def get_start_end_idx(
    audio_size: int,
    clip_size: int,
    clip_idx: int,
    num_clips: int,
    start_sample: int = 0,
    rng: np.random.Generator | None = None,
):
    delta = max(audio_size - clip_size, 0)
    if clip_idx == -1:
        rng = rng or np.random.default_rng()
        start_idx = rng.uniform(0, delta)
    else:
        start_idx = np.linspace(0, delta, num=num_clips)[clip_idx]
    end_idx = start_idx + clip_size - 1
    return start_sample + start_idx, start_sample + end_idx
