"""Pallas log-mel tile-size sweep at a given batch (bf16 production path).

The round-1 default (k_tile=256, r_tile_cap=256) was tuned at batch 64;
this sweeps the (k_tile, r_tile_cap) grid at the batch the train/eval loops
actually run (128 by default). Chain-differenced device timing.

Usage: ASF_BENCH_BATCH=128 python scripts/bench_dsp_tiles.py
"""

import os
import time

import numpy as np

from asf_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache

apply_platform_env()  # honour ASF_PLATFORM/ASF_CPU_DEVICES (axon rewrites JAX_PLATFORMS)
enable_compilation_cache()

BATCH = int(os.environ.get("ASF_BENCH_BATCH", 128))
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from asf_tpu.config import get_cfg
    from asf_tpu.dsp.logmel import LogMelParams
    from asf_tpu.ops.logmel_pallas import PallasLogMel

    cfg = get_cfg()
    cfg.TPU.DSP_PRECISION = "BFLOAT16"
    cfg.TPU.USE_PALLAS_DSP = True
    p = LogMelParams(cfg)
    t_out = cfg.AUDIO_DATA.NUM_FRAMES
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((BATCH, clip)).astype(np.float32) * 0.1)

    def timeit(kernel):
        def chained(w, n):
            def body(c, _):
                y = kernel(c, t_out)
                return c + 1e-24 * jnp.mean(y).astype(c.dtype), None

            out, _ = jax.lax.scan(body, w, None, length=n)
            return jnp.sum(out)

        short = jax.jit(lambda w: chained(w, ITERS))
        long = jax.jit(lambda w: chained(w, 3 * ITERS))
        float(short(wave))
        float(long(wave))

        def best(f, n=3):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                float(f(wave))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (best(long) - best(short)) / (2 * ITERS)

    results = []
    for k_tile in (128, 256, 512):
        for r_cap in (128, 256, 512):
            kern = PallasLogMel(
                p.dft_w, p.mel_w, p.n_fft, p.hop,
                compute_dtype=jnp.bfloat16, k_tile=k_tile, r_tile_cap=r_cap,
            )
            dt = timeit(kern)
            results.append((dt, k_tile, r_cap))
            print(
                f"k_tile={k_tile:4d} r_cap={r_cap:4d}: {dt*1e3:6.2f} ms / "
                f"{BATCH} clips", flush=True,
            )
    results.sort()
    dt, kt, rc = results[0]
    print(f"best: k_tile={kt} r_cap={rc} at {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
