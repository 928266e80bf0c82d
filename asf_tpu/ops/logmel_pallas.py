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


def frame_waveform(wave: jnp.ndarray, t_frames: int, hop: int, n_fft: int,
                   support: tuple[int, int] | None = None) -> jnp.ndarray:
    """(B, S) centred waveform -> (B, t_frames, K) overlapping frame slices.

    Frame ``i`` is ``padded[i*hop : i*hop + n_fft]`` with the librosa centre
    padding (n_fft//2 zeros) prepended. Because every frame start is
    hop-aligned, the frame matrix is a concatenation of ``J = ceil(n_fft/hop)``
    shifted views of the hop-blocked waveform — dense slices, no gather.

    ``support=(s0, s1)`` emits only frame columns [s0, s1) — the window's
    nonzero extent. The reference centre-pads a short Hann window into n_fft
    (win_length=240 vs n_fft=2048 at production geometry, dsp/mel.py
    ``padded_window``), so ~88% of the DFT basis rows are exactly zero;
    slicing frames to the support cuts the DFT GEMM contraction (and this
    pre-pass's HBM traffic) by n_fft/(s1-s0) with bit-identical results.
    """
    b, s = wave.shape
    pad_front = n_fft // 2
    s0, s1 = support if support is not None else (0, n_fft)
    j_lo, j_hi = s0 // hop, (s1 - 1) // hop
    j_blocks = -(-n_fft // hop)  # ceil: row count matches the full layout
    need = (t_frames - 1 + j_blocks) * hop  # samples after front pad
    padded = jnp.pad(wave, ((0, 0), (pad_front, max(0, need - s - pad_front))))
    padded = padded[:, :need]
    blocked = padded.reshape(b, t_frames - 1 + j_blocks, hop)
    shifts = [blocked[:, j : j + t_frames] for j in range(j_lo, j_hi + 1)]
    frames = jnp.stack(shifts, axis=2).reshape(b, t_frames, (j_hi - j_lo + 1) * hop)
    return frames[:, :, s0 - j_lo * hop : s0 - j_lo * hop + (s1 - s0)]


def hop_blocks(wave: jnp.ndarray, t_frames: int, hop: int, n_fft: int,
               rows_pad: int) -> jnp.ndarray:
    """(B, S) waveform -> (B, rows_pad, 128) hop-blocked layout.

    Row r holds samples ``padded[r*hop : (r+1)*hop]`` (librosa centre padding
    prepended), zero-padded from ``hop`` to the 128-lane width. Frame ``i``
    is the concatenation of rows ``i .. i + ceil(n_fft/hop) - 1`` — the
    hop-block kernel rebuilds frames from these rows in VMEM, so the 17x
    frame redundancy (n_fft/hop) never touches HBM.
    """
    b, s = wave.shape
    pad_front = n_fft // 2
    j_blocks = -(-n_fft // hop)
    n_rows = t_frames - 1 + j_blocks
    need = n_rows * hop
    padded = jnp.pad(wave, ((0, 0), (pad_front, max(0, need - s - pad_front))))
    blocked = padded[:, :need].reshape(b, n_rows, hop)
    return jnp.pad(blocked, ((0, 0), (0, rows_pad - n_rows), (0, 128 - hop)))


def _kernel_hopblock(blocked_ref, wcos_ref, wsin_ref, mel_ref, out_ref, *,
                     precision, k_chunk, nk, j_blocks, j_off, t_frames, eps):
    """Per-sample log-mel from hop blocks; frames exist only in VMEM.

    blocked_ref: (1, rows_pad, 128) hop blocks of ONE waveform.
    wcos/wsin:   (j_blocks*128, kf) block-row-major DFT basis (lane-padded).
    mel_ref:     (kf, m).
    out_ref:     (1, t_frames, m) log-mel.

    DFT decomposition: frame_i = [hopblk_i .. hopblk_{i+J-1}], so
    DFT = sum_j shifted(blocked)[i+j] @ W_j — J static sublane-shifted views
    of the SAME resident block, J x nk small matmuls on the MXU. Removes the
    (B*T, n_fft) frame materialisation entirely (at n_fft=2048, hop=120 that
    pre-pass wrote 17x the waveform bytes and cost as much HBM time as the
    kernel's compute).

    ``j_blocks``/``j_off`` cover only the WINDOW SUPPORT: the Hann window is
    centre-padded into n_fft (win 240 vs n_fft 2048 at production geometry),
    so basis rows outside [j_off*hop, (j_off+j_blocks)*hop) are exactly zero
    and their block GEMMs are skipped — 18 -> 3 blocks, 6x fewer DFT flops,
    bit-identical output.
    """
    blk = blocked_ref[0]
    m = out_ref.shape[-1]

    def kbody(k, acc):
        ks = k * k_chunk
        re = jnp.zeros((t_frames, k_chunk), jnp.float32)
        im = jnp.zeros((t_frames, k_chunk), jnp.float32)
        for j in range(j_blocks):  # static unroll: static sublane shifts
            lhs = blk[j_off + j : j_off + j + t_frames, :]
            wc = wcos_ref[pl.dslice(j * 128, 128), pl.dslice(ks, k_chunk)]
            ws = wsin_ref[pl.dslice(j * 128, 128), pl.dslice(ks, k_chunk)]
            re = re + jax.lax.dot_general(
                lhs, wc, (((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32,
            )
            im = im + jax.lax.dot_general(
                lhs, ws, (((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32,
            )
        mag = jnp.sqrt(re * re + im * im)
        mel = mel_ref[pl.dslice(ks, k_chunk), :]
        return acc + jax.lax.dot_general(
            mag.astype(mel.dtype), mel, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(0, nk, kbody, jnp.zeros((t_frames, m), jnp.float32))
    out_ref[0] = jnp.log(acc + eps)


@functools.partial(
    jax.jit,
    static_argnames=("k_chunk", "t_frames", "j_blocks", "j_off", "precision",
                     "interpret", "eps"),
)
def _hopblock_logmel(blocked, w_cos, w_sin, mel_w, *, k_chunk, t_frames, j_blocks,
                     j_off, precision, interpret, eps):
    b, rows_pad, _ = blocked.shape
    kf = w_cos.shape[1]
    m = mel_w.shape[1]
    nk = kf // k_chunk
    flops = b * nk * (2 * t_frames * j_blocks * 128 * k_chunk * 2
                      + 2 * t_frames * k_chunk * m)
    bytesz = blocked.dtype.itemsize
    return pl.pallas_call(
        functools.partial(
            _kernel_hopblock, precision=precision, k_chunk=k_chunk, nk=nk,
            j_blocks=j_blocks, j_off=j_off, t_frames=t_frames, eps=eps,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows_pad, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((j_blocks * 128, kf), lambda i: (0, 0)),  # resident
            pl.BlockSpec((j_blocks * 128, kf), lambda i: (0, 0)),  # resident
            pl.BlockSpec((kf, m), lambda i: (0, 0)),               # resident
        ],
        out_specs=pl.BlockSpec((1, t_frames, m), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t_frames, m), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=b * rows_pad * 128 * bytesz
            + (2 * j_blocks * 128 * kf + kf * m) * bytesz
            + b * t_frames * m * 4,
            transcendentals=b * nk * t_frames * k_chunk,  # sqrt
        ),
        interpret=interpret,
    )(blocked, w_cos, w_sin, mel_w)


def _kernel_resident(frames_ref, wcos_ref, wsin_ref, mel_ref, out_ref, *,
                     precision, k_chunk, nk, eps):
    """Weights-resident single-pass variant (bf16 production path).

    Grid is (n_row_tiles,) only: the full [W_cos|W_sin|mel] stack (~10 MB at
    bf16 for n_fft=2048) stays in VMEM across the whole grid (constant index
    maps are fetched once), and a fori_loop accumulates the mel projection
    over frequency chunks. Versus the partial-tile kernel this removes the
    x(nk) re-streaming of the frame matrix (the dominant HBM traffic at
    production geometry) and the (nk, rows, m) partial stack round-trip, and
    folds the log epilogue in — the kernel output IS the log-mel block.
    """
    f = frames_ref[:]
    m = out_ref.shape[-1]
    r = f.shape[0]

    def body(k, acc):
        ks = k * k_chunk
        wc = wcos_ref[:, pl.dslice(ks, k_chunk)]
        ws = wsin_ref[:, pl.dslice(ks, k_chunk)]
        re = jax.lax.dot_general(
            f, wc, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )
        im = jax.lax.dot_general(
            f, ws, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )
        mag = jnp.sqrt(re * re + im * im)
        mel = mel_ref[pl.dslice(ks, k_chunk), :]
        return acc + jax.lax.dot_general(
            mag.astype(mel.dtype), mel, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(0, nk, body, jnp.zeros((r, m), jnp.float32))
    out_ref[:] = jnp.log(acc + eps)


@functools.partial(
    jax.jit, static_argnames=("k_chunk", "r_tile", "precision", "interpret", "eps")
)
def _resident_logmel(frames, w_cos, w_sin, mel_w, *, k_chunk, r_tile, precision,
                     interpret, eps):
    rows, n_fft = frames.shape
    kf = w_cos.shape[1]
    m = mel_w.shape[1]
    nk, nr = kf // k_chunk, rows // r_tile
    flops = nr * nk * (2 * r_tile * n_fft * k_chunk * 2 + 2 * r_tile * k_chunk * m)
    bytesz = frames.dtype.itemsize
    return pl.pallas_call(
        functools.partial(
            _kernel_resident, precision=precision, k_chunk=k_chunk, nk=nk, eps=eps
        ),
        grid=(nr,),
        in_specs=[
            pl.BlockSpec((r_tile, n_fft), lambda r: (r, 0)),
            pl.BlockSpec((n_fft, kf), lambda r: (0, 0)),   # resident
            pl.BlockSpec((n_fft, kf), lambda r: (0, 0)),   # resident
            pl.BlockSpec((kf, m), lambda r: (0, 0)),       # resident
        ],
        out_specs=pl.BlockSpec((r_tile, m), lambda r: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, m), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=rows * n_fft * bytesz
            + (2 * n_fft * kf + kf * m) * bytesz
            + rows * m * 4,
            transcendentals=nr * nk * r_tile * k_chunk,  # sqrt
        ),
        interpret=interpret,
    )(frames, w_cos, w_sin, mel_w)


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
                 r_tile_cap: int | None = None,
                 support: tuple[int, int] | None = None):
        self.n_fft = int(n_fft)
        self.hop = int(hop)
        n_freqs, n_mels = mel_w.shape
        self.compute_dtype = compute_dtype
        # bf16 production path: the support-trimmed weight stack (~1.5 MB
        # bf16 at production geometry) stays VMEM-resident, so the resident/
        # hop-block kernels stream the input exactly once and fuse the freq
        # accumulation + log — see _kernel_resident/_kernel_hopblock. The
        # HIGHEST-parity path keeps the partial-tile kernel (its bit-match
        # against librosa is golden-tested; trimming zero rows is exact).
        self.resident = compute_dtype == jnp.bfloat16
        # Tile sizes chosen to stay inside the 16 MB scoped-VMEM budget with
        # Mosaic's double buffering (f32 blocks are 2x the bytes of bf16).
        # v5e sweep (scripts/bench_dsp_tiles.py): k_tile 256 beats both 128
        # and 512 at bf16, and r_tile 512 edges 256 at batch 64 (1.46 vs
        # 1.49 ms) and 128 (3.48 vs 3.55 ms) — taller row tiles amortise the
        # weight-block re-streams without blowing VMEM. For the resident
        # kernel, k_tile is the fori accumulation chunk: 384 divides the
        # padded 1152 (= round_up(1025, 384)) with only 11% pad waste.
        if self.resident:
            self.k_tile = int(k_tile) if k_tile else 384
            self.r_tile_cap = int(r_tile_cap) if r_tile_cap else 256
        else:
            self.k_tile = int(k_tile) if k_tile else 256
            self.r_tile_cap = int(r_tile_cap) if r_tile_cap else 128
        self.m = _round_up(n_mels, 128)
        self.n_mels = n_mels
        kf = _round_up(n_freqs, self.k_tile)

        # WINDOW SUPPORT: the reference centre-pads a short Hann window into
        # n_fft (dsp/mel.py padded_window; win 240 vs n_fft 2048 at the
        # production geometry), so only rows [s0, s1) of the window-folded
        # basis are nonzero. Every kernel contracts over the support only —
        # dropping exactly-zero basis rows is bit-identical and cuts the DFT
        # GEMM flops by n_fft/(s1-s0) (~8x at production geometry).
        if support is None:  # standalone use: derive from the basis itself
            nz = np.flatnonzero(np.abs(dft_w).sum(axis=1) > 0.0)
            support = (int(nz[0]), int(nz[-1]) + 1) if nz.size else (0, self.n_fft)
        s0, s1 = support  # LogMelParams passes its own (single source of truth)
        # 128-aligned support for the frames-resident/partial kernels (the
        # contraction dim is the frame lane axis).
        self.s0a = (s0 // 128) * 128
        self.s1a = min(self.n_fft, _round_up(s1, 128))
        self.ksup = self.s1a - self.s0a

        w_cos = np.zeros((self.ksup, kf), np.float32)
        w_sin = np.zeros((self.ksup, kf), np.float32)
        w_cos[:, :n_freqs] = dft_w[self.s0a : self.s1a, :n_freqs]
        w_sin[:, :n_freqs] = dft_w[self.s0a : self.s1a, n_freqs:]
        melp = np.zeros((kf, self.m), np.float32)
        melp[:n_freqs, :n_mels] = mel_w
        self.w_cos = jnp.asarray(w_cos, compute_dtype)
        self.w_sin = jnp.asarray(w_sin, compute_dtype)
        self.mel_w = jnp.asarray(melp, compute_dtype)

        # Hop-block kernel: covers support blocks [j_lo, j_hi] only (lanes are
        # padded hop -> 128). It trades a wider contraction (j_eff*128 vs the
        # aligned support ksup) for skipping the frames pre-pass, whose HBM
        # traffic scales with ksup — so it wins only for WIDE supports
        # (measured v5e, batch 128: ksup 2048 -> hop-block 2.17 ms vs
        # frames-resident 3.77; ksup 256 -> 0.67 vs 0.60).
        j_lo, j_hi = s0 // self.hop, (s1 - 1) // self.hop
        j_eff = j_hi - j_lo + 1
        self.j_blocks = -(-self.n_fft // self.hop)  # full row count (layout)
        self.j_eff, self.j_lo = j_eff, j_lo
        self.hopblock = (
            self.resident
            and self.hop <= 128
            and self.ksup > 512
            and (j_eff * 128) / self.ksup <= 1.55
        )
        if self.resident:
            # Block-row-major basis for the hop-block kernel: row jj*128+s is
            # DFT basis row (j_lo+jj)*hop+s (s < hop; lanes hop..127 zero,
            # matching the zero lane padding of hop_blocks).
            wcb = np.zeros((j_eff * 128, kf), np.float32)
            wsb = np.zeros((j_eff * 128, kf), np.float32)
            for jj in range(j_eff):
                lo = (j_lo + jj) * self.hop
                n = min(self.hop, self.n_fft - lo)
                if n > 0:
                    wcb[jj * 128 : jj * 128 + n, :n_freqs] = dft_w[lo : lo + n, :n_freqs]
                    wsb[jj * 128 : jj * 128 + n, :n_freqs] = dft_w[lo : lo + n, n_freqs:]
            self.w_cos_blk = jnp.asarray(wcb, compute_dtype)
            self.w_sin_blk = jnp.asarray(wsb, compute_dtype)
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
        if self.hopblock and t_pad <= 512:
            rows_pad = _round_up(t_pad - 1 + self.j_blocks, 8)
            blocked = hop_blocks(
                wave.astype(self.compute_dtype), t_pad, self.hop, self.n_fft, rows_pad
            )
            log_mel = _hopblock_logmel(
                blocked, self.w_cos_blk, self.w_sin_blk, self.mel_w,
                k_chunk=self.k_tile, t_frames=t_pad, j_blocks=self.j_eff,
                j_off=self.j_lo, precision=self.precision, interpret=interpret,
                eps=eps,
            )
            return log_mel[:, :n_frames, : self.n_mels]
        # Cast BEFORE framing: framing only copies samples, so rounding the
        # waveform to the compute dtype first yields bit-identical frames
        # while halving the bf16 pre-pass HBM traffic (the frame matrix is
        # the largest intermediate in the whole front end).
        frames = frame_waveform(
            wave.astype(self.compute_dtype), t_pad, self.hop, self.n_fft,
            support=(self.s0a, self.s1a),
        )
        frames = frames.reshape(b * t_pad, self.ksup)
        if self.resident:
            log_mel = _resident_logmel(
                frames, self.w_cos, self.w_sin, self.mel_w,
                k_chunk=self.k_tile, r_tile=r_tile,
                precision=self.precision, interpret=interpret, eps=eps,
            ).reshape(b, t_pad, self.m)
            return log_mel[:, :n_frames, : self.n_mels]
        partial = _partial_mel(
            frames, self.w_cos, self.w_sin, self.mel_w,
            k_tile=self.k_tile, r_tile=r_tile,
            precision=self.precision, interpret=interpret,
        )
        mel = jnp.sum(partial, axis=0).reshape(b, t_pad, self.m)
        return jnp.log(mel[:, :n_frames, : self.n_mels] + eps)
