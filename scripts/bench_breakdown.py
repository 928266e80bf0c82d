"""Train-step time breakdown at production geometry (PROFILE.md source).

Components, each timed with a device-side scan chain (two-length difference,
data dependency between iterations — see bench.py for why host timing lies
through the dispatch relay):

  dsp_eval    waveform -> log-mel pathways (Pallas bf16, no augmentation)
  dsp_train   the same + SpecAugment (warp_time_taps + masks)
  fwd_eval    full waveform -> logits eval forward
  train_step  full fwd + loss + bwd + SGD update (host-dispatched chain)

Usage: ASF_BENCH_BATCH=128 python scripts/bench_breakdown.py
"""

import os
import time

import numpy as np

from asf_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache

apply_platform_env()  # honour ASF_PLATFORM/ASF_CPU_DEVICES (axon rewrites JAX_PLATFORMS)
enable_compilation_cache()

BATCH = int(os.environ.get("ASF_BENCH_BATCH", 128))
ITERS = 10


from asf_tpu.utils.timing import chain_timer  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from asf_tpu.config import get_cfg
    from asf_tpu.dsp.specaugment import spec_augment_batch
    from asf_tpu.engine.steps import init_state, make_input_pipeline
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

    pipeline = make_input_pipeline(cfg)
    model = build_model(cfg)
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((BATCH, clip)).astype(np.float32) * 0.1)
    n_valid = jnp.full((BATCH,), clip, jnp.int32)
    key = jax.random.PRNGKey(7)

    paths = pipeline(wave, n_valid, None, train=False)
    variables = model.init(jax.random.PRNGKey(0), paths, train=False)

    t_dsp_eval = chain_timer(lambda w: pipeline(w, n_valid, None, train=False)[1], wave)
    t_dsp_train = chain_timer(lambda w: pipeline(w, n_valid, key, train=True)[1], wave)

    def fwd_eval(w):
        out = model.apply(variables, pipeline(w, n_valid, None, train=False), train=False)
        return out[0] if isinstance(out, (tuple, list)) else out

    t_fwd_eval = chain_timer(fwd_eval, wave)

    # full train step: host-dispatched chain difference (state is the carry)
    batch = {
        "waveform": np.asarray(wave),
        "n_valid": np.asarray(n_valid),
        "labels": {"class_id": rng.integers(0, 309, (BATCH,)).astype(np.int64)},
    }

    from asf_tpu.engine.steps import lazy_optimizer

    lazy = lazy_optimizer(cfg)
    state = init_state(cfg, model, lazy, jax.random.PRNGKey(0), batch)
    batch_dev = jax.tree.map(jnp.asarray, batch)

    # Scan-chained train-step timing: the step carried through lax.scan with
    # the SAME resident batch. A host dispatch loop over donated buffers is
    # unreliable here — the relay caches repeat dispatches (CLAUDE.md).
    from asf_tpu.engine.steps import _make_step_core

    core = _make_step_core(cfg, model, lazy.tx)

    def chained(st, n):
        def body(s, _):
            s2, parts, stats = core(s, batch_dev, jnp.float32(0.1), key)
            return s2, None

        out, _ = jax.lax.scan(body, st, None, length=n)
        return out

    short = jax.jit(lambda s: chained(s, 8))
    long = jax.jit(lambda s: chained(s, 24))
    jax.block_until_ready(short(state).params)
    jax.block_until_ready(long(state).params)

    def best(f, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            # host read, not block_until_ready: through the relay the latter
            # can resolve before execution (CLAUDE.md benchmark-timing note)
            float(f(state).step)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_step = (best(long) - best(short)) / 16

    ms = lambda s: s * 1e3  # noqa: E731
    print(f"batch {BATCH}, bf16 Pallas DSP")
    print(f"dsp_eval     : {ms(t_dsp_eval):7.2f} ms  (log-mel + pathway pack)")
    print(f"dsp_train    : {ms(t_dsp_train):7.2f} ms  (+ SpecAugment: {ms(t_dsp_train - t_dsp_eval):.2f})")
    print(f"fwd_eval     : {ms(t_fwd_eval):7.2f} ms  (trunk+head: {ms(t_fwd_eval - t_dsp_eval):.2f})")
    print(f"train_step   : {ms(t_step):7.2f} ms  (fwd+bwd+update incl. dsp_train)")
    print(f"  -> bwd+update approx: {ms(t_step - t_dsp_train - (t_fwd_eval - t_dsp_eval)):.2f} ms")
    print(f"train clips/s/chip: {BATCH / t_step:.0f}; eval clips/s/chip: {BATCH / t_fwd_eval:.0f}")


if __name__ == "__main__":
    main()
