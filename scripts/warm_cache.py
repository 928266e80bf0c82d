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

The first four are compiled by the engine's own ``warm_compile``
(asf_tpu/engine/warmup.py — the same code path TPU.WARM_COMPILE_ON_START
runs), so the cache keys CANNOT diverge from the real dispatches; this
script only adds the programs train(cfg) never touches (test-loop forward,
precise-BN, TEST.BATCH_SIZE variants). GRU configs compile one program per
window bucket: the single production bucket when TPU.GRU_SINGLE_BUCKET (the
default), else all power-of-two buckets up to MAX_NB_SPECTROGRAMS — bound
the warmed set with the same config override the run uses, e.g.
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


def main(argv=None):
    t_start = time.time()

    import jax
    import numpy as np

    from asf_tpu.config import get_cfg  # noqa: F401  (parser loads it)
    from asf_tpu.engine.steps import (
        TrainState,
        init_state,
        lazy_optimizer,
        make_eval_metrics_step,
        make_eval_multi_step,
        make_eval_step,
        make_train_multi_step,
        make_train_step,
    )
    from asf_tpu.engine.train_loop import make_precise_bn_step
    from asf_tpu.engine.warmup import (
        _macro,
        canonical_batches,
        int16_in_effect,
        warm_compile,
    )
    from asf_tpu.models import build_model
    from asf_tpu.parallel.mesh import (
        macro_batch_sharding,
        make_mesh,
        param_shardings,
        put_with,
        replicate_tree,
        shard_batch,
    )
    from asf_tpu.utils.logging import setup_logging
    from asf_tpu.utils.parser import load_config, parse_args

    setup_logging()
    args = parse_args(argv)
    cfg = load_config(args)

    mesh = make_mesh(cfg)
    model = build_model(cfg)
    k = max(1, int(cfg.TPU.STEPS_PER_DISPATCH))
    batch_size = cfg.TRAIN.BATCH_SIZE

    int16 = int16_in_effect(cfg)  # probe once; shared by every batch set
    batches = canonical_batches(cfg, batch_size, int16=int16)
    example = dict(batches[0])

    lazy = lazy_optimizer(cfg)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    state = init_state(cfg, model, lazy, rng, example)
    state = TrainState(
        params=param_shardings(state.params, mesh),
        batch_stats=replicate_tree(state.batch_stats, mesh),
        opt_state=param_shardings(state.opt_state, mesh),
        step=state.step,
    )

    train_step = make_train_step(cfg, model, lazy.tx)
    # A store-mode run (TPU.TRAIN_DEVICE_CACHE_MB + FUSED_STORE_GATHER)
    # dispatches the FUSED offset-macro program; recover the exact mega aval
    # from the dataset's segment table (no audio read) so the warmed compile
    # key matches the real run's.
    store_spec = None
    if k > 1 and bool(getattr(cfg.TPU, "FUSED_STORE_GATHER", True)):
        from asf_tpu.engine.warmup import store_lowering_spec

        store_spec = store_lowering_spec(cfg, mesh)
        if store_spec is not None:
            print(
                f"[warm] fused store program: mega {store_spec.mega.shape} "
                f"{store_spec.mega.dtype}", flush=True,
            )
    multi_step = (
        make_train_multi_step(cfg, model, lazy.tx, store=store_spec)
        if k > 1
        else None
    )
    eval_step = make_eval_step(cfg, model)
    metrics_step = make_eval_metrics_step(cfg, model)
    eval_multi = make_eval_multi_step(cfg, model) if k > 1 else None
    pbn_step = make_precise_bn_step(cfg) if cfg.BN.USE_PRECISE_STATS else None

    # The train(cfg) dispatch set, via the engine's own warm-up — identical
    # cache keys by construction.
    n = warm_compile(
        cfg, mesh, state, train_step, multi_step, metrics_step, eval_multi,
        int16=int16, store=store_spec,
    )

    ms = macro_batch_sharding(mesh)

    def warm_eval_set(bset, bsz, tag):
        """test(cfg)'s programs: plain eval forward + K-scanned multi-eval."""
        count = 0
        for b in bset:
            t0 = time.time()
            eval_step.lower(state, shard_batch(dict(b), mesh)).compile()
            print(f"[warm] {tag} fwd      {b['waveform'].shape}: {time.time()-t0:.1f}s", flush=True)
            count += 1
            if eval_multi is not None:
                t0 = time.time()
                masks = put_with(np.ones((k, bsz), np.float32), ms)
                eval_multi.lower(state, put_with(_macro(b, k), ms), masks).compile()
                print(f"[warm] {tag} K={k}      {b['waveform'].shape}: {time.time()-t0:.1f}s", flush=True)
                count += 1
        return count

    n += warm_eval_set(batches, batch_size, "eval")

    if pbn_step is not None:
        for b in batches:
            t0 = time.time()
            pbn_step.lower(
                state.params, state.batch_stats, shard_batch(dict(b), mesh)
            ).compile()
            print(f"[warm] precise-BN    {b['waveform'].shape}: {time.time()-t0:.1f}s", flush=True)
            n += 1

    # test(cfg) dispatches at TEST.BATCH_SIZE (loader.py construct_loader),
    # a DIFFERENT compile key than the train/val programs above whenever it
    # differs from TRAIN.BATCH_SIZE (defaults: 8 vs 64) — warm those too.
    test_bs = int(cfg.TEST.BATCH_SIZE)
    if test_bs != batch_size:
        n += warm_eval_set(
            canonical_batches(cfg, test_bs, int16=int16), test_bs, "test"
        )

    print(f"[warm] {n} programs compiled+cached in {time.time()-t_start:.0f}s", flush=True)


if __name__ == "__main__":
    main()
