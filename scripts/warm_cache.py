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
dispatches bit-for-bit. GRU configs compile one program per window bucket:
the single production bucket when TPU.GRU_SINGLE_BUCKET (the default), else
all power-of-two buckets up to MAX_NB_SPECTROGRAMS — bound the warmed set
with the same config override the run uses, e.g.
`... TPU.GRU_SINGLE_BUCKET True` in the trailing KEY VAL opts.

Usage:
    python scripts/warm_cache.py --cfg path/to/config.yaml [KEY VAL ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asf_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache

apply_platform_env()
enable_compilation_cache()


# canonical shapes + int16 probe live in the engine so train(cfg)'s
# TPU.WARM_COMPILE_ON_START path uses the exact same dispatch keys
from asf_tpu.engine.warmup import canonical_batches as _canonical_batches  # noqa: E402


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
