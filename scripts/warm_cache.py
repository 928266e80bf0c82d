"""Pre-compile the canonical dispatch set into the persistent XLA cache.

Full-model compiles through the TPU relay take minutes (the K-step scanned
train step 20-30 min cold); the persistent compilation cache
(asf_tpu/utils/jax_setup.py) makes re-runs fast but only AFTER someone has
paid the cold compile. This script pays it up front, off the training
critical path, for exactly the programs `train(cfg)` / `test(cfg)` dispatch:

  * train multi-step (K = TPU.STEPS_PER_DISPATCH scanned macro batch)
  * train single step (epoch tails / bucket changes)
  * fused eval metrics step + K-scanned eval multi-step
  * eval forward (test loop) + K-scanned test multi-eval
  * precise-BN stats step (if BN.USE_PRECISE_STATS)

All inputs are zeros with the canonical (batch, clip) shapes and the same
NamedSharding placements the loops use, so the cache keys match the real
dispatches bit-for-bit. GRU configs compile one program per window bucket —
pass --buckets to bound which ones get warmed (default: the single
production bucket when TPU.GRU_SINGLE_BUCKET, else all power-of-two buckets
up to MAX_NB_SPECTROGRAMS).

Usage:
    python scripts/warm_cache.py --cfg path/to/config.yaml [opts KEY VAL ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asf_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache

apply_platform_env()
enable_compilation_cache()


def _int16_in_effect(cfg):
    """The waveform dtype the REAL run will dispatch.

    cfg.TPU.INT16_TRANSFER alone is not enough: the datasets run a
    construct-time probe (off-PCM-grid HDF5, non-mono/non-int16 wavs) that
    can disable int16 at runtime — and then every program warmed for int16
    keys would miss the cache. Replicate the decision by constructing the
    dataset when the data is reachable; fall back to the flag (with a
    warning) when it is not.
    """
    if not cfg.TPU.INT16_TRANSFER:
        return False
    try:
        from asf_tpu.data.build import build_dataset

        ds = build_dataset(cfg.TRAIN.DATASET, cfg, "train")
        return bool(getattr(ds, "int16", False))
    except Exception as e:  # data absent: warm for the flag-derived dtype
        print(
            f"warm_cache: could not probe the dataset ({type(e).__name__}: {e});"
            " assuming TPU.INT16_TRANSFER holds — if the real run's probe"
            " disables int16, re-run warm_cache with the data present."
        )
        return True


def _canonical_batches(cfg, batch_size):
    """Zero batches with the shapes the loaders collate."""
    import numpy as np

    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    wave_dtype = np.int16 if _int16_in_effect(cfg) else np.float32
    multitask = len(cfg.MODEL.NUM_CLASSES) > 1

    def labels():
        if multitask:
            lab = {
                "verb": np.zeros((batch_size,), np.int64),
                "noun": np.zeros((batch_size,), np.int64),
            }
            if not cfg.MODEL.ONLY_ACTION_RECOGNITION:
                import pandas as pd

                n_attr = len(pd.read_csv(cfg.MODEL.PDDL_ATTRIBUTES))
                lab["precs"] = np.zeros((batch_size, n_attr), np.float32)
                lab["posts"] = np.zeros((batch_size, n_attr), np.float32)
            return lab
        return {"class_id": np.zeros((batch_size,), np.int64)}

    gru = cfg.MODEL.MODEL_NAME == "AudioSlowFastGRU"
    batches = []
    if gru:
        max_n = cfg.AUDIO_DATA.MAX_NB_SPECTROGRAMS
        if cfg.TPU.GRU_SINGLE_BUCKET:
            buckets = [max_n]
        else:
            buckets, b = [], 1
            while b < max_n:
                buckets.append(b)
                b *= 2
            buckets.append(max_n)
        for nb in sorted(set(buckets)):
            batches.append(
                {
                    "waveform": np.zeros((batch_size, nb, clip), wave_dtype),
                    "n_valid": np.ones((batch_size, nb), np.int32),
                    "lengths": np.ones((batch_size,), np.int32),
                    "noun_embedding": np.zeros((batch_size, 512), np.float32),
                    "labels": labels(),
                    "index": np.arange(batch_size, dtype=np.int64),
                }
            )
    else:
        batches.append(
            {
                "waveform": np.zeros((batch_size, clip), wave_dtype),
                "n_valid": np.full((batch_size,), clip, np.int32),
                "labels": labels(),
                "index": np.arange(batch_size, dtype=np.int64),
            }
        )
    return batches


def main(argv=None):
    t_start = time.time()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from asf_tpu.config import get_cfg  # noqa: F401  (parser loads it)
    from asf_tpu.engine.steps import (
        init_state,
        make_eval_metrics_step,
        make_eval_multi_step,
        make_eval_step,
        make_train_multi_step,
        make_train_step,
    )
    from asf_tpu.engine.train_loop import make_precise_bn_step
    from asf_tpu.models import build_model
    from asf_tpu.parallel.mesh import (
        batch_sharding,
        macro_batch_sharding,
        make_mesh,
        param_shardings,
        put_with,
        replicate_tree,
        shard_batch,
    )
    from asf_tpu.utils.parser import load_config, parse_args

    args = parse_args(argv)
    cfg = load_config(args)

    mesh = make_mesh(cfg)
    model = build_model(cfg)
    k = max(1, int(cfg.TPU.STEPS_PER_DISPATCH))
    batch_size = cfg.TRAIN.BATCH_SIZE

    batches = _canonical_batches(cfg, batch_size)
    example = dict(batches[0])

    from asf_tpu.engine.steps import lazy_optimizer

    lazy = lazy_optimizer(cfg)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    state = init_state(cfg, model, lazy, rng, example)
    from asf_tpu.engine.steps import TrainState

    state = TrainState(
        params=param_shardings(state.params, mesh),
        batch_stats=replicate_tree(state.batch_stats, mesh),
        opt_state=param_shardings(state.opt_state, mesh),
        step=state.step,
    )

    train_step = make_train_step(cfg, model, lazy.tx)
    multi_step = make_train_multi_step(cfg, model, lazy.tx) if k > 1 else None
    eval_step = make_eval_step(cfg, model)
    metrics_step = make_eval_metrics_step(cfg, model)
    eval_multi = make_eval_multi_step(cfg, model) if k > 1 else None
    pbn_step = make_precise_bn_step(cfg) if cfg.BN.USE_PRECISE_STATS else None

    bs = batch_sharding(mesh)
    ms = macro_batch_sharding(mesh)

    def _macro(b):
        return {
            key: (
                {kk: np.stack([vv] * k) for kk, vv in val.items()}
                if isinstance(val, dict)
                else np.stack([val] * k)
            )
            for key, val in b.items()
        }

    n = 0
    for b in batches:
        t0 = time.time()
        sb = shard_batch(dict(b), mesh)
        # train steps donate the state buffers: chain the returned state
        state, parts, _ = train_step(state, sb, jnp.float32(0.0), rng)
        jax.block_until_ready(parts["loss"])
        print(f"[warm] train single  {b['waveform'].shape}: {time.time()-t0:.1f}s", flush=True)
        n += 1

        if multi_step is not None:
            t0 = time.time()
            mb = put_with(_macro(b), ms)
            lrs = jnp.zeros((k,), jnp.float32)
            state, parts, _ = multi_step(state, mb, lrs, rng)
            jax.block_until_ready(parts["loss"])
            print(f"[warm] train K={k}     {b['waveform'].shape}: {time.time()-t0:.1f}s", flush=True)
            n += 1

        t0 = time.time()
        mask = put_with(np.ones((batch_size,), np.float32), bs)
        outs, accs = metrics_step(state, shard_batch(dict(b), mesh), mask)
        jax.block_until_ready(accs)
        print(f"[warm] eval metrics  {b['waveform'].shape}: {time.time()-t0:.1f}s", flush=True)
        n += 1

        if eval_multi is not None:
            t0 = time.time()
            masks = put_with(np.ones((k, batch_size), np.float32), ms)
            outs, accs = eval_multi(state, put_with(_macro(b), ms), masks)
            jax.block_until_ready(accs)
            print(f"[warm] eval K={k}      {b['waveform'].shape}: {time.time()-t0:.1f}s", flush=True)
            n += 1

        t0 = time.time()
        preds = eval_step(state, shard_batch(dict(b), mesh))
        jax.block_until_ready(preds)
        print(f"[warm] eval fwd      {b['waveform'].shape}: {time.time()-t0:.1f}s", flush=True)
        n += 1

        if pbn_step is not None:
            t0 = time.time()
            stats = pbn_step(state.params, state.batch_stats, shard_batch(dict(b), mesh))
            jax.block_until_ready(stats)
            print(f"[warm] precise-BN    {b['waveform'].shape}: {time.time()-t0:.1f}s", flush=True)
            n += 1

    # test(cfg) dispatches at TEST.BATCH_SIZE (loader.py construct_loader),
    # a DIFFERENT compile key than the train/val programs above whenever it
    # differs from TRAIN.BATCH_SIZE (defaults: 8 vs 64) — warm those too.
    test_bs = int(cfg.TEST.BATCH_SIZE)
    if test_bs != batch_size:
        for b in _canonical_batches(cfg, test_bs):
            t0 = time.time()
            preds = eval_step(state, shard_batch(dict(b), mesh))
            jax.block_until_ready(preds)
            print(f"[warm] test fwd      {b['waveform'].shape}: {time.time()-t0:.1f}s", flush=True)
            n += 1
            if eval_multi is not None:
                t0 = time.time()
                masks = put_with(np.ones((k, test_bs), np.float32), ms)
                outs, accs = eval_multi(state, put_with(_macro(b), ms), masks)
                jax.block_until_ready(accs)
                print(f"[warm] test K={k}      {b['waveform'].shape}: {time.time()-t0:.1f}s", flush=True)
                n += 1

    print(f"[warm] {n} programs compiled+cached in {time.time()-t_start:.0f}s", flush=True)


if __name__ == "__main__":
    main()
