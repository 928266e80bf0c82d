"""XProf pass over the K-scanned TRAIN dispatch, focused on bwd+update.

VERDICT r3 weak #5: bwd+update ≈ 8.9 ms of the 12.57 ms train step dominates
and was never profiled post-s2d. This script traces ONE K-scan train dispatch
(`jax.profiler.trace`), converts the xspace with xprof's hlo_stats tool, and
prints the top HLO programs by self-time with their occurrences — forward
ops are identifiable by the shared fwd fusion names also present in the eval
step, so anything large and NOT in the eval profile is backward work.

Usage (real TPU):
    ASF_BENCH_BATCH=128 ASF_BENCH_K=8 python scripts/profile_train_bwd.py
CPU smoke (tiny shapes, validates the trace/convert plumbing only):
    ASF_PLATFORM=cpu ASF_SMOKE=1 python scripts/profile_train_bwd.py
"""

import glob
import json
import os
import time

from asf_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache

apply_platform_env()  # honour ASF_PLATFORM/ASF_CPU_DEVICES (axon rewrites JAX_PLATFORMS)
enable_compilation_cache()

SMOKE = bool(int(os.environ.get("ASF_SMOKE", "0")))
BATCH = int(os.environ.get("ASF_BENCH_BATCH", 4 if SMOKE else 128))
K = int(os.environ.get("ASF_BENCH_K", 2 if SMOKE else 8))
TRACE_DIR = os.environ.get("ASF_TRACE_DIR", "/tmp/asf_bwd_trace")
TOP_N = int(os.environ.get("ASF_TOP_N", 30))


def build(cfg_tweaks=None):
    import numpy as np

    from asf_tpu.config import get_cfg
    from asf_tpu.engine.steps import (
        TrainState,
        init_state,
        lazy_optimizer,
        make_train_multi_step,
    )
    from asf_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "AudioSlowFast"
    cfg.MODEL.NUM_CLASSES = [309]
    cfg.RESNET.DEPTH = 50
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3, 3], [4, 4], [6, 6], [3, 3]]
    cfg.RESNET.FREQUENCY_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.FREQUENCY_DILATIONS = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.USE_PALLAS_DSP = not SMOKE
    cfg.TPU.DSP_PRECISION = "BFLOAT16"
    cfg.TRAIN.DATASET = "Vggsound"
    cfg.TRAIN.BATCH_SIZE = BATCH
    cfg.TPU.STEPS_PER_DISPATCH = K
    if SMOKE:  # tiny_cfg()-style geometry (tests/fixtures.py)
        cfg.AUDIO_DATA.SAMPLING_RATE = 8000
        cfg.AUDIO_DATA.N_FFT = 256
        cfg.AUDIO_DATA.CLIP_SECS = 0.32
        cfg.AUDIO_DATA.NUM_FRAMES = 64
        cfg.AUDIO_DATA.NUM_FREQUENCIES = 32
        cfg.AUDIO_DATA.SPECTROGRAM_OVERLAP = 0.1
        cfg.SLOWFAST.ALPHA = 4
        cfg.RESNET.DEPTH = 26
        cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1, 1], [1, 1], [1, 1], [1, 1]]
    if cfg_tweaks:
        for k, v in cfg_tweaks.items():
            setattr(cfg, k, v)

    model = build_model(cfg)
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    rng = np.random.default_rng(0)
    batch = {
        "waveform": rng.standard_normal((K, BATCH, clip), dtype=np.float32) * 0.1,
        "n_valid": np.full((K, BATCH), clip, np.int32),
        "labels": {
            "class_id": rng.integers(0, 309, (K, BATCH)).astype(np.int64)
        },
        "index": np.arange(K * BATCH, dtype=np.int64).reshape(K, BATCH),
    }

    import jax

    lazy = lazy_optimizer(cfg)
    example = {k: (v[0] if not isinstance(v, dict) else {kk: vv[0] for kk, vv in v.items()}) for k, v in batch.items()}
    state = init_state(cfg, model, lazy, jax.random.PRNGKey(0), example)
    multi = make_train_multi_step(cfg, model, lazy.tx)
    return cfg, state, multi, batch


def main():
    import jax
    import jax.numpy as jnp

    cfg, state, multi, batch = build()
    dev_batch = jax.device_put(batch)
    lrs = jnp.full((K,), 0.01, jnp.float32)
    rng = jax.random.PRNGKey(1)

    # warm: compile + one run so the traced dispatch is pure execution
    t0 = time.time()
    state, _parts, _stats = multi(state, dev_batch, lrs, rng)
    jax.block_until_ready(state.params)
    print(f"compile+first dispatch: {time.time() - t0:.1f}s")

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        state, _parts, _stats = multi(state, dev_batch, lrs, rng)
        jax.block_until_ready(state.params)

    xspaces = sorted(glob.glob(os.path.join(TRACE_DIR, "**/*.xplane.pb"), recursive=True))
    assert xspaces, f"no xplane.pb under {TRACE_DIR}"
    print(f"trace: {xspaces[-1]}")

    from xprof.convert import raw_to_tool_data

    data, _ctype = raw_to_tool_data.xspace_to_tool_data(
        [xspaces[-1]], "hlo_stats", {}
    )
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    payload = json.loads(data)
    # hlo_stats payload: gviz-style {cols: [...], rows: [{c: [{v: ...}]}]}
    cols = [c.get("label") or c.get("id") for c in payload.get("cols", [])]
    rows = payload.get("rows", [])

    if not rows:
        # CPU backend traces carry host events only — no device HLO table.
        print("hlo_stats: 0 rows (expected on CPU smoke; run on real TPU)")
        return

    def col(name_sub):
        for i, c in enumerate(cols):
            if c and name_sub.lower() in str(c).lower():
                return i
        return None

    i_name = col("hlo op name")
    i_time = col("total self time (us)")
    i_occ = col("occurrence")
    i_cat = col("hlo op category")
    i_gfs = col("model gflop/s")
    i_bw = col("hbm bw")
    i_bound = col("bound by")
    recs = []
    for r in rows:
        c = r["c"]

        def v(i):
            return c[i].get("v") if i is not None and i < len(c) else None

        recs.append(
            (
                float(v(i_time) or 0.0),
                v(i_name),
                v(i_occ),
                v(i_cat),
                float(v(i_gfs) or 0.0),
                float(v(i_bw) or 0.0),
                v(i_bound),
            )
        )
    # key= keeps ties from comparing the name/category fields, which may be
    # None under xprof column renames — a TypeError here would lose the
    # whole (expensive) trace+convert run.
    recs.sort(key=lambda r: r[0], reverse=True)
    total = sum(t for t, *_ in recs)
    print(
        f"\n{'self us':>10} {'%':>5} {'occ':>4} {'TF/s':>7} "
        f"{'HBM GB/s':>8} {'bound':>8}  category / op"
    )
    for t, name, occ, cat, gfs, bw, bound in recs[:TOP_N]:
        print(
            f"{t:10.1f} {100 * t / max(total, 1e-9):5.1f} {str(occ):>4} "
            f"{gfs / 1000:7.1f} {bw:8.1f} {str(bound):>8}  [{cat}] {name}"
        )
    print(f"\ntotal hlo self-time: {total:.1f} us over {len(recs)} ops")
    slow_mxu = [
        (t, name) for t, name, occ, cat, gfs, bw, bound in recs
        if cat in ("convolution", "dot") and gfs and gfs / 1000 < 100 and t > 0.01 * total
    ]
    if slow_mxu:
        print("\nMXU ops below 100 TF/s with >1% share (candidates):")
        for t, name in slow_mxu:
            print(f"  {t:10.1f} us  {name}")


if __name__ == "__main__":
    main()
