"""Microbenchmark: log-mel front end on TPU — XLA path vs fused Pallas kernel.

Run:  python scripts/bench_dsp.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from asf_tpu.config import get_cfg
from asf_tpu.dsp.logmel import LogMelParams, log_mel_spectrogram
from asf_tpu.utils.jax_setup import apply_platform_env

apply_platform_env()  # honour ASF_PLATFORM/ASF_CPU_DEVICES

BATCH = 64
ITERS = 50


def timed(fn, wave):
    """Device-side scan chain with a data dependency between iterations, and
    a two-length difference — host-side per-call timing is unreliable here
    (the relay caches identical dispatches) and includes fixed overheads.

    Not asf_tpu.utils.timing.chain_timer because this variant ALSO reports
    the cold-compile seconds (part of this bench's output)."""

    def chained(w0, iters):
        def body(w, _):
            y = fn(w)
            return w + 1e-24 * jnp.mean(y).astype(w.dtype), None

        w_final, _ = jax.lax.scan(body, w0, None, length=iters)
        return jnp.sum(w_final)

    short = jax.jit(lambda w: chained(w, ITERS))
    long = jax.jit(lambda w: chained(w, 3 * ITERS))
    t0 = time.time()
    float(short(wave))
    compile_s = time.time() - t0
    float(long(wave))

    def best_of(f, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(f(wave))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = (best_of(long) - best_of(short)) / (2 * ITERS)
    return compile_s, dt


def main():
    rng = np.random.default_rng(0)
    results = {}
    for name, pallas, prec in [
        ("xla_f32", False, "HIGHEST"),
        ("pallas_f32", True, "HIGHEST"),
        ("xla_bf16", False, "BFLOAT16"),
        ("pallas_bf16", True, "BFLOAT16"),
    ]:
        cfg = get_cfg()
        cfg.TPU.USE_PALLAS_DSP = pallas
        cfg.TPU.DSP_PRECISION = prec
        p = LogMelParams(cfg)
        wave = jnp.asarray(
            rng.standard_normal((BATCH, p.clip_samples)).astype(np.float32) * 0.1
        )
        fn = lambda w, p=p: log_mel_spectrogram(w, p, out_frames=cfg.AUDIO_DATA.NUM_FRAMES)
        compile_s, dt = timed(fn, wave)
        clips = BATCH / dt
        results[name] = (compile_s, dt, clips)
        print(
            f"{name:12s} compile={compile_s:6.1f}s  step={dt*1e3:7.2f}ms  "
            f"clips/s={clips:9.0f}",
            flush=True,
        )
    # numerical agreement spot check on device
    cfg = get_cfg()
    cfg.TPU.USE_PALLAS_DSP = False
    pa = LogMelParams(cfg)
    cfg2 = get_cfg()
    cfg2.TPU.USE_PALLAS_DSP = True
    pb = LogMelParams(cfg2)
    wave = jnp.asarray(
        rng.standard_normal((2, pa.clip_samples)).astype(np.float32) * 0.1
    )
    a = np.asarray(log_mel_spectrogram(wave, pa, out_frames=cfg.AUDIO_DATA.NUM_FRAMES))
    b = np.asarray(log_mel_spectrogram(wave, pb, out_frames=cfg.AUDIO_DATA.NUM_FRAMES))
    print("max |xla-pallas| (f32):", np.abs(a - b).max(), flush=True)


if __name__ == "__main__":
    main()
