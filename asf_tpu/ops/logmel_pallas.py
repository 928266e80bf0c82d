"""Fused Pallas TPU kernel for the log-mel front end.

The XLA path in ``asf_tpu.dsp.logmel`` computes the windowed real-DFT and
the mel projection as two separate MXU ops (a strided conv and an einsum).
XLA cannot fuse across two MXU ops, so the (B, T, 2*n_freqs) DFT
coefficients and the (B, T, n_freqs) magnitudes round-trip through HBM —
at the production geometry (n_fft=2048, T=400, B=64) that is ~0.6 GB of
avoidable traffic per batch.

This kernel keeps the whole chain

    frames @ W_cos, frames @ W_sin -> |.| -> partial mel GEMM

inside VMEM for each (freq-tile, row-tile) block. The frequency axis is
tiled (the full f32 DFT basis is ~17 MB and does not fit in VMEM), and
because mel is *linear* in the magnitude, each frequency tile contributes an
independent partial mel product: the kernel writes per-tile partials and the
caller sums the small (nk, rows, n_mels) stack and takes the log. The grid
is ordered (freq-tile, row-tile) so the DFT basis block index only changes
with the *outer* grid dimension — Pallas elides the re-fetch across the
inner row sweep, so the basis is streamed exactly once.

Framing (overlapping windows, hop < n_fft) cannot be expressed as a
non-overlapping BlockSpec, and per-row dynamic slices inside the kernel
serialize on the VPU; instead the caller materialises frames with the
hop-block shift trick in ``frame_waveform`` (hop-aligned slices + concat —
dense copies, no gather).

Replaces the host-side librosa STFT/mel of the reference
(/root/reference/audio_slowfast/datasets/audio_loader_epic.py:66-97) —
same math, golden-tested against the numpy oracle in
``asf_tpu.dsp.reference``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def frame_waveform(wave: jnp.ndarray, t_frames: int, hop: int, n_fft: int) -> jnp.ndarray:
    """(B, S) centred waveform -> (B, t_frames, n_fft) overlapping frames.

    Frame ``i`` is ``padded[i*hop : i*hop + n_fft]`` with the librosa centre
    padding (n_fft//2 zeros) prepended. Because every frame start is
    hop-aligned, the frame matrix is a concatenation of ``J = ceil(n_fft/hop)``
    shifted views of the hop-blocked waveform — dense slices, no gather.
    """
    b, s = wave.shape
    pad_front = n_fft // 2
    j_blocks = -(-n_fft // hop)  # ceil
    need = (t_frames - 1 + j_blocks) * hop  # samples after front pad
    padded = jnp.pad(wave, ((0, 0), (pad_front, max(0, need - s - pad_front))))
    padded = padded[:, :need]
    blocked = padded.reshape(b, t_frames - 1 + j_blocks, hop)
    shifts = [blocked[:, j : j + t_frames] for j in range(j_blocks)]
    frames = jnp.stack(shifts, axis=2).reshape(b, t_frames, j_blocks * hop)
    return frames[:, :, :n_fft]


def _kernel(frames_ref, wcos_ref, wsin_ref, mel_ref, out_ref, *, precision):
    f = frames_ref[:]
    re = jax.lax.dot_general(
        f, wcos_ref[:], (((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )
    im = jax.lax.dot_general(
        f, wsin_ref[:], (((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )
    mag = jnp.sqrt(re * re + im * im)
    out_ref[:] = jax.lax.dot_general(
        mag.astype(mel_ref.dtype), mel_ref[:], (((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )[None]


@functools.partial(
    jax.jit, static_argnames=("k_tile", "r_tile", "precision", "interpret")
)
def _partial_mel(frames, w_cos, w_sin, mel_w, *, k_tile, r_tile, precision, interpret):
    rows, n_fft = frames.shape
    kf = w_cos.shape[1]
    m = mel_w.shape[1]
    nk, nr = kf // k_tile, rows // r_tile
    flops = nr * nk * (2 * r_tile * n_fft * k_tile * 2 + 2 * r_tile * k_tile * m)
    bytesz = frames.dtype.itemsize
    return pl.pallas_call(
        functools.partial(_kernel, precision=precision),
        grid=(nk, nr),
        in_specs=[
            pl.BlockSpec((r_tile, n_fft), lambda k, r: (r, 0)),
            pl.BlockSpec((n_fft, k_tile), lambda k, r: (0, k)),
            pl.BlockSpec((n_fft, k_tile), lambda k, r: (0, k)),
            pl.BlockSpec((k_tile, m), lambda k, r: (k, 0)),
        ],
        out_specs=pl.BlockSpec((1, r_tile, m), lambda k, r: (k, r, 0)),
        out_shape=jax.ShapeDtypeStruct((nk, rows, m), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=rows * n_fft * bytesz * nk
            + 2 * n_fft * kf * bytesz
            + nk * rows * m * 4,
            transcendentals=nr * nk * r_tile * k_tile,  # sqrt
        ),
        interpret=interpret,
    )(frames, w_cos, w_sin, mel_w)


class PallasLogMel:
    """Precomputed padded GEMM weights + tiling for the fused kernel.

    Args:
      dft_w: (n_fft, 2*n_freqs) concatenated [W_cos | W_sin] basis from
        ``asf_tpu.dsp.mel.dft_matrices`` (Hann window folded in).
      mel_w: (n_freqs, n_mels) HTK filterbank transpose.
      compute_dtype: jnp.float32 for librosa parity (matmuls run at
        ``precision=HIGHEST``), jnp.bfloat16 for the fast production path.
    """

    def __init__(self, dft_w: np.ndarray, mel_w: np.ndarray, n_fft: int, hop: int,
                 compute_dtype=jnp.float32, k_tile: int | None = None,
                 r_tile_cap: int | None = None):
        self.n_fft = int(n_fft)
        self.hop = int(hop)
        n_freqs, n_mels = mel_w.shape
        self.compute_dtype = compute_dtype
        # Tile sizes chosen to stay inside the 16 MB scoped-VMEM budget with
        # Mosaic's double buffering (f32 blocks are 2x the bytes of bf16).
        # v5e sweep (scripts/bench_dsp_tiles.py): k_tile 256 beats both 128
        # and 512 at bf16, and r_tile 512 edges 256 at batch 64 (1.46 vs
        # 1.49 ms) and 128 (3.48 vs 3.55 ms) — taller row tiles amortise the
        # weight-block re-streams without blowing VMEM.
        self.k_tile = int(k_tile) if k_tile else 256
        self.r_tile_cap = (
            int(r_tile_cap) if r_tile_cap
            else (512 if compute_dtype == jnp.bfloat16 else 128)
        )
        self.m = _round_up(n_mels, 128)
        self.n_mels = n_mels
        kf = _round_up(n_freqs, self.k_tile)
        w_cos = np.zeros((self.n_fft, kf), np.float32)
        w_sin = np.zeros((self.n_fft, kf), np.float32)
        w_cos[:, :n_freqs] = dft_w[:, :n_freqs]
        w_sin[:, :n_freqs] = dft_w[:, n_freqs:]
        melp = np.zeros((kf, self.m), np.float32)
        melp[:n_freqs, :n_mels] = mel_w
        self.w_cos = jnp.asarray(w_cos, compute_dtype)
        self.w_sin = jnp.asarray(w_sin, compute_dtype)
        self.mel_w = jnp.asarray(melp, compute_dtype)
        self.precision = (
            jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )

    def __call__(self, wave: jnp.ndarray, n_frames: int, eps: float = 1e-6,
                 interpret: bool | None = None) -> jnp.ndarray:
        """(B, S) waveform -> (B, n_frames, n_mels) log-mel spectrogram."""
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        b = wave.shape[0]
        # Row-tile the flattened (B*T) frame axis; keep tiles MXU-sized when
        # the batch allows, degrade to the largest 8-multiple divisor else.
        t_pad = _round_up(n_frames, 8)
        cap = self.r_tile_cap
        r_tile = next(r for r in range(cap, 7, -8) if (b * t_pad) % r == 0)
        frames = frame_waveform(wave.astype(jnp.float32), t_pad, self.hop, self.n_fft)
        frames = frames.reshape(b * t_pad, self.n_fft).astype(self.compute_dtype)
        partial = _partial_mel(
            frames, self.w_cos, self.w_sin, self.mel_w,
            k_tile=self.k_tile, r_tile=r_tile,
            precision=self.precision, interpret=interpret,
        )
        mel = jnp.sum(partial, axis=0).reshape(b, t_pad, self.m)
        return jnp.log(mel[:, :n_frames, : self.n_mels] + eps)
