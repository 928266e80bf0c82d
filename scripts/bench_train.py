"""Training-step throughput: fwd + loss + bwd + optax update at the
production VGG-Sound geometry (bf16 trunk, fused Pallas bf16 DSP,
SpecAugment in-graph). Chained-scan timing (see bench.py)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from asf_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache

apply_platform_env()  # honour ASF_PLATFORM/ASF_CPU_DEVICES (axon rewrites JAX_PLATFORMS)
enable_compilation_cache()

import os
BATCH = int(os.environ.get("ASF_BENCH_BATCH", 64))
ITERS = 20


def main():
    from asf_tpu.config import get_cfg
    from asf_tpu.engine.steps import TrainState, init_state, make_train_step
    from asf_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "AudioSlowFast"
    cfg.MODEL.NUM_CLASSES = [309]
    cfg.RESNET.DEPTH = 50
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3, 3], [4, 4], [6, 6], [3, 3]]
    cfg.RESNET.FREQUENCY_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.FREQUENCY_DILATIONS = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.USE_PALLAS_DSP = True
    cfg.TPU.DSP_PRECISION = "BFLOAT16"
    cfg.TRAIN.DATASET = "Vggsound"

    model = build_model(cfg)
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    rng = np.random.default_rng(0)
    batch = {
        "waveform": rng.standard_normal((BATCH, clip)).astype(np.float32) * 0.1,
        "n_valid": np.full((BATCH,), clip, np.int32),
        "labels": {"class_id": rng.integers(0, 309, (BATCH,)).astype(np.int64)},
    }

    from asf_tpu.engine.steps import lazy_optimizer

    lazy = lazy_optimizer(cfg)
    state = init_state(cfg, model, lazy, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(cfg, model, lazy.tx)

    batch_dev = jax.tree.map(jnp.asarray, batch)
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    state, parts, _ = train_step(state, batch_dev, jnp.float32(0.1), key)
    print(f"compile+first step: {time.time()-t0:.1f}s loss={float(parts['loss']):.3f}",
          flush=True)

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, parts, _ = train_step(state, batch_dev, jnp.float32(0.1), key)
        float(parts["loss"])  # host-read barrier
        return time.perf_counter() - t0

    run(2)  # warm
    # best-of-3 on each chain length: single measurements at ~50 ms dispatch
    # round-trips are noisy enough to go negative on the difference
    t_short = min(run(ITERS) for _ in range(3))
    t_long = min(run(3 * ITERS) for _ in range(3))
    dt = (t_long - t_short) / (2 * ITERS)
    print(
        f"train step: {dt*1e3:.2f} ms/step -> {BATCH/dt:.0f} clips/s/chip (fwd+bwd+update)",
        flush=True,
    )


if __name__ == "__main__":
    main()
