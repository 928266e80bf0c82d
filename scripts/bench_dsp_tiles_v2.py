"""Tile sweep for the weights-resident log-mel kernel (bf16, real chip).

Sweeps (k_chunk, r_tile) and the bf16-framing pre-pass; prints ms per call
at the bench geometry. VMEM-overflow combinations are reported and skipped.

Usage: ASF_BENCH_BATCH=128 python scripts/bench_dsp_tiles_v2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asf_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache

apply_platform_env()
enable_compilation_cache()

BATCH = int(os.environ.get("ASF_BENCH_BATCH", 128))
ITERS = 10


from asf_tpu.utils.timing import chain_timer  # noqa: E402


def main():
    import jax.numpy as jnp
    import numpy as np

    from asf_tpu.config import get_cfg
    from asf_tpu.dsp.logmel import LogMelParams
    from asf_tpu.ops.logmel_pallas import (
        _resident_logmel,
        _round_up,
        frame_waveform,
    )

    cfg = get_cfg()
    cfg.TPU.USE_PALLAS_DSP = True
    cfg.TPU.DSP_PRECISION = "BFLOAT16"
    p = LogMelParams(cfg)
    pal = p.pallas
    clip = p.clip_samples
    t_frames = 1 + clip // p.hop
    t_pad = _round_up(t_frames, 8)
    rows = BATCH * t_pad

    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((BATCH, clip)).astype(np.float32) * 0.1)

    t = chain_timer(
        lambda w: frame_waveform(w.astype(jnp.bfloat16), t_pad, pal.hop, pal.n_fft), wave
    )
    print(f"frame bf16-first : {t*1e3:7.2f} ms", flush=True)

    n_freqs = 1 + p.n_fft // 2
    for k_chunk in (1152, 576, 384, 128):
        kf = _round_up(n_freqs, k_chunk)
        w_cos = np.zeros((p.n_fft, kf), np.float32)
        w_sin = np.zeros((p.n_fft, kf), np.float32)
        w_cos[:, :n_freqs] = p.dft_w[:, :n_freqs]
        w_sin[:, :n_freqs] = p.dft_w[:, n_freqs:]
        melp = np.zeros((kf, 128), np.float32)
        melp[:n_freqs, : p.n_mels] = p.mel_w
        wc = jnp.asarray(w_cos, jnp.bfloat16)
        ws = jnp.asarray(w_sin, jnp.bfloat16)
        mw = jnp.asarray(melp, jnp.bfloat16)
        for r_tile in (512, 256, 128):
            if rows % r_tile:
                continue

            def run(w, kc=k_chunk, rt=r_tile, wc=wc, ws=ws, mw=mw):
                f = frame_waveform(w.astype(jnp.bfloat16), t_pad, pal.hop, pal.n_fft)
                f = f.reshape(rows, pal.n_fft)
                return _resident_logmel(
                    f, wc, ws, mw, k_chunk=kc, r_tile=rt,
                    precision=pal.precision, interpret=False, eps=1e-6,
                )

            try:
                t = chain_timer(run, wave)
                print(f"k_chunk {k_chunk:4d} (kf {kf}) r_tile {r_tile:3d}: "
                      f"{t*1e3:7.2f} ms", flush=True)
            except Exception as e:
                print(f"k_chunk {k_chunk:4d} (kf {kf}) r_tile {r_tile:3d}: "
                      f"FAIL {str(e).splitlines()[0][:90]}", flush=True)


if __name__ == "__main__":
    main()
