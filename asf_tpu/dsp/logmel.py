"""On-device log-mel front end (JAX/XLA, MXU-friendly).

TPU-first redesign of the reference's host-side librosa pipeline
(/root/reference/audio_slowfast/datasets/audio_loader_epic.py:66-97):
the reference spends its input pipeline in Python DataLoader workers doing
librosa FFTs on CPU; here the whole chain

    waveform -> framing -> windowed real-DFT -> |.| -> mel GEMM -> log -> pad

runs inside the jitted step as two large GEMMs (windowed-DFT and mel
projection), so it fuses with the model and maps onto the MXU
(GEMM-spectrogram approach; cf. nnAudio, arXiv:1912.12055).

Numerical parity with librosa is golden-tested against
``asf_tpu.dsp.reference`` to <1e-4 relative.

Static-shape design notes:
  * Input waveforms are fixed-length ``clip_samples`` arrays (hosts pad
    short records with zeros — identical to librosa's ``pad_mode="constant"``
    zero padding, see reference.py docstring).
  * Per-record "edge-pad spectrogram to NUM_FRAMES"
    (audio_loader_epic.py:151-154) becomes a clamped gather on the time axis
    with a per-sample valid-frame count, which is exactly edge padding.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .mel import dft_matrices, mel_filterbank
from .reference import stft_params


def num_frames_for(n_samples: int, hop: int) -> int:
    """librosa frame count for a centred STFT: 1 + n_samples // hop."""
    return 1 + n_samples // hop


class LogMelParams:
    """Precomputed constants of the front end (host numpy; baked into jit)."""

    def __init__(self, cfg):
        self.sr = cfg.AUDIO_DATA.SAMPLING_RATE
        self.n_fft = cfg.AUDIO_DATA.N_FFT
        self.n_mels = cfg.AUDIO_DATA.NUM_FREQUENCIES
        self.num_frames = cfg.AUDIO_DATA.NUM_FRAMES
        self.win, self.hop = stft_params(cfg)
        # Reference slices [start, start + clip_size - 1) -> clip_size-1 samples
        # (datasets/utils.py:12-40 end_idx = start + clip_size - 1).
        self.clip_size = int(round(self.sr * cfg.AUDIO_DATA.CLIP_SECS))
        self.clip_samples = self.clip_size - 1

        w_cos, w_sin = dft_matrices(self.n_fft, self.win)
        # One GEMM computes both real and imaginary parts: [n_fft, 2*n_freqs].
        self.dft_w = np.concatenate([w_cos, w_sin], axis=1)
        self.mel_w = mel_filterbank(self.sr, self.n_fft, self.n_mels).T  # (n_freqs, n_mels)
        self.n_freqs = 1 + self.n_fft // 2
        # Nonzero row extent of the window-folded basis (the Hann window is
        # centre-padded into n_fft, mel.py padded_window) — kernels contract
        # over this support only; outside rows are exactly zero.
        nz = np.flatnonzero(np.abs(self.dft_w).sum(axis=1) > 0.0)
        self.support = (int(nz[0]), int(nz[-1]) + 1) if nz.size else (0, self.n_fft)

        tpu_cfg = getattr(cfg, "TPU", None)
        prec_name = tpu_cfg.DSP_PRECISION if tpu_cfg is not None else "HIGHEST"
        # "BFLOAT16"/"DEFAULT" select the fast production path (bf16 GEMM
        # inputs, fp32 accumulation); "HIGHEST" keeps <1e-4 librosa parity.
        self.fast = prec_name.upper() in ("BFLOAT16", "BF16", "DEFAULT")
        self.precision = (
            jax.lax.Precision.DEFAULT if self.fast else jax.lax.Precision.HIGHEST
        )

        self.pallas: Optional[object] = None
        if tpu_cfg is not None and getattr(tpu_cfg, "USE_PALLAS_DSP", False):
            if self.n_fft % 128 == 0:
                from asf_tpu.ops.logmel_pallas import PallasLogMel

                self.pallas = PallasLogMel(
                    self.dft_w,
                    self.mel_w,
                    self.n_fft,
                    self.hop,
                    compute_dtype=jnp.bfloat16 if self.fast else jnp.float32,
                    support=self.support,
                )
            else:
                import warnings

                warnings.warn(
                    f"USE_PALLAS_DSP requires n_fft % 128 == 0 (TPU lane "
                    f"width); got {self.n_fft} — using the XLA path."
                )


def _windowed_dft(
    wave: jnp.ndarray, dft_w: jnp.ndarray, n_fft: int, hop: int, precision,
    support: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """(B, S) -> (B, n_frames, 2*n_freqs) windowed real-DFT coefficients.

    Framing + windowed DFT expressed as ONE strided 1-D convolution whose
    2*n_freqs filters are the window-scaled cos/sin basis rows — the implicit
    GEMM form (cf. nnAudio, arXiv:1912.12055). No frame tensor is ever
    materialised; XLA maps it straight onto the MXU.

    ``support=(s0, s1)``: nonzero row extent of the window-folded basis. The
    reference centre-pads a short Hann window into n_fft (win 240 vs n_fft
    2048 at production geometry), so the conv filters can be cut to the
    support width — bit-identical coefficients, n_fft/(s1-s0) fewer flops.
    """
    s0, s1 = support if support is not None else (0, n_fft)
    pad = n_fft // 2
    # Frame i covers padded[i*hop : i*hop + n_fft]; its support slice starts
    # at i*hop + s0, so shifting the conv input by s0 keeps frame starts
    # aligned while the filters shrink to (s1 - s0) taps.
    padded = jnp.pad(wave, ((0, 0), (pad - min(s0, pad), pad)))
    if s0 > pad:  # window support starts past the centre padding
        padded = padded[:, s0 - pad :]
    # lhs (B, C=1, S); rhs (O=2*n_freqs, I=1, K=s1-s0)
    rhs = jnp.transpose(dft_w[s0:s1])[:, None, :]
    out = jax.lax.conv_general_dilated(
        padded[:, None, :],
        rhs,
        window_strides=(hop,),
        padding="VALID",
        precision=precision,
    )  # (B, 2*n_freqs, T)
    n_frames = 1 + wave.shape[1] // hop
    return jnp.transpose(out[:, :, :n_frames], (0, 2, 1))


def log_mel_spectrogram(
    wave: jnp.ndarray,
    params: LogMelParams,
    n_valid_samples: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
    out_frames: Optional[int] = None,
) -> jnp.ndarray:
    """Batched waveform -> log-mel spectrogram.

    Args:
      wave: (B, S) float32 waveform (fixed S; short records zero-padded).
      params: precomputed constants.
      n_valid_samples: optional (B,) int32 — true record length per sample;
        frames past ``1 + n_valid // hop`` are edge-replicated, matching the
        reference's np.pad(..., 'edge') to NUM_FRAMES.
      out_frames: output frame count (defaults to max(NUM_FRAMES, n_frames)).

    Returns:
      (B, T_out, n_mels) float32.
    """
    wave = wave.astype(jnp.float32)
    n_frames = num_frames_for(wave.shape[1], params.hop)
    if params.pallas is not None:
        log_mel = params.pallas(wave, n_frames, eps=eps)  # (B, T, n_mels)
    else:
        spec = _windowed_dft(
            wave, jnp.asarray(params.dft_w), params.n_fft, params.hop,
            params.precision, support=params.support,
        )  # (B, T, 2*n_freqs)
        re = spec[..., : params.n_freqs]
        im = spec[..., params.n_freqs :]
        mag = jnp.sqrt(re * re + im * im)

        mel_w = jnp.asarray(params.mel_w)
        mel = jnp.einsum("btk,km->btm", mag, mel_w, precision=params.precision)
        log_mel = jnp.log(mel + eps)  # (B, T, n_mels)

    t_out = out_frames if out_frames is not None else max(params.num_frames, n_frames)

    # Edge-pad / edge-replicate along time (reference: np.pad(..., 'edge'),
    # audio_loader_epic.py:66-156). The clamped index min(t, limit-1) is the
    # identity below ``limit`` and a constant row above it, so instead of a
    # full (B, T_out, M) gather (VPU-serialised, ~0.13 ms/128 clips — it was
    # the single most expensive non-conv op in the eval step) gather ONE edge
    # row per sample and select with an iota mask — bit-identical, fuses into
    # the consumer.
    if n_valid_samples is not None:
        valid_frames = 1 + n_valid_samples.astype(jnp.int32) // params.hop  # (B,)
        limit = jnp.minimum(valid_frames, n_frames)[:, None]  # (B, 1)
    else:
        limit = jnp.full((wave.shape[0], 1), n_frames, dtype=jnp.int32)
    if log_mel.shape[1] < t_out:
        log_mel = jnp.pad(log_mel, ((0, 0), (0, t_out - log_mel.shape[1]), (0, 0)))
    else:
        log_mel = log_mel[:, :t_out]
    edge = jnp.take_along_axis(log_mel, (limit - 1)[:, :, None], axis=1)  # (B, 1, M)
    keep = jnp.arange(t_out)[None, :, None] < limit[:, :, None]  # (B, T_out, 1)
    return jnp.where(keep, log_mel, edge)


def make_logmel(cfg):
    """Returns (params, jitted fn(wave, n_valid) -> (B, NUM_FRAMES, n_mels))."""
    params = LogMelParams(cfg)

    @functools.partial(jax.jit, static_argnames=())
    def fn(wave, n_valid=None):
        return log_mel_spectrogram(wave, params, n_valid)

    return params, fn
