"""Mid-epoch exception hygiene: train_epoch must stop the DevicePrefetcher
(whose worker otherwise retries q.put forever, pinning uploaded macros) and
reap its metrics thread even when the step or a metrics flush raises."""

import threading
import time

import numpy as np
import jax
import pytest

from fixtures import make_epic_fixture, tiny_cfg


@pytest.mark.slow
def test_train_epoch_exception_stops_prefetcher(tmp_path):
    from asf_tpu.data.loader import construct_loader
    from asf_tpu.engine.steps import init_state, lazy_optimizer, make_train_step
    from asf_tpu.engine.train_loop import build_train_meter, train_epoch
    from asf_tpu.models import build_model
    from asf_tpu.parallel.mesh import make_mesh, param_shardings, replicate_tree
    from asf_tpu.engine.steps import TrainState

    root = str(tmp_path)
    make_epic_fixture(root, n_records=12)  # 3 iters/epoch at batch 4
    cfg = tiny_cfg(root)
    cfg.TPU.PREFETCH_DEPTH = 2
    cfg.TPU.STEPS_PER_DISPATCH = 1

    mesh = make_mesh(cfg)
    loader = construct_loader(cfg, "train")
    example = next(iter(loader))
    example.pop("metadata", None)

    model = build_model(cfg)
    lazy = lazy_optimizer(cfg)
    state = init_state(cfg, model, lazy, jax.random.PRNGKey(0), example)
    state = TrainState(
        params=param_shardings(state.params, mesh),
        batch_stats=replicate_tree(state.batch_stats, mesh),
        opt_state=param_shardings(state.opt_state, mesh),
        step=state.step,
    )
    real_step = make_train_step(cfg, model, lazy.tx)

    calls = {"n": 0}

    def exploding_step(state, batch, lr, rng):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("boom (injected)")
        return real_step(state, batch, lr, rng)

    meter = build_train_meter(cfg, len(loader))

    # record that the prefetcher is actually stopped (its worker thread has
    # no distinguishing name to poll for)
    import asf_tpu.data.loader as ld

    stopped = []
    orig_stop = ld.DevicePrefetcher.stop

    def rec_stop(self):
        stopped.append(True)
        return orig_stop(self)

    ld.DevicePrefetcher.stop = rec_stop
    try:
        with pytest.raises(RuntimeError, match="boom"):
            train_epoch(
                loader, state, exploding_step, meter, 0, cfg, mesh,
                jax.random.PRNGKey(0),
            )
    finally:
        ld.DevicePrefetcher.stop = orig_stop

    assert stopped, "DevicePrefetcher.stop() not called on mid-epoch exception"

    # the prefetcher worker must exit promptly (stop() drains its queue) and
    # the metrics pool thread must be reaped. NOTE: ThreadPoolExecutor
    # workers are NON-daemon threads (since py3.9), so the grace loop must
    # not filter on t.daemon — train_epoch's finally now does
    # shutdown(wait=True), so this loop is belt-and-braces only.
    deadline = time.time() + 10.0
    while time.time() < deadline:
        alive = [
            t for t in threading.enumerate()
            if t.is_alive() and t.name.startswith("asf-metrics")
        ]
        if not alive:
            break
        time.sleep(0.2)
    assert not [
        t for t in threading.enumerate()
        if t.is_alive() and t.name.startswith("asf-metrics")
    ], "metrics thread not reaped after mid-epoch exception"
