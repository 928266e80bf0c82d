"""wandb.watch(log="all") parity (VERDICT r3 missing #2).

The reference registers per-layer parameter/gradient histograms every
LOG_PERIOD batches (tools/train_net.py:768 ``wandb.watch``). On TPU the
tensors never leave the device: engine/steps.py summarises each layer to a
64-bin histogram in-graph behind a ``lax.cond`` on ``step % LOG_PERIOD``,
the flush thread routes the payload to ScalarLogger.log_histograms, and the
wandb sink reconstructs ``wandb.Histogram(np_histogram=...)``.
"""

import sys
import types

import numpy as np
import jax
import pytest

from asf_tpu.config import get_cfg


def _tiny_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "AudioSlowFast"
    cfg.MODEL.NUM_CLASSES = [6]
    cfg.MODEL.ARCH = "slowfast"
    cfg.RESNET.DEPTH = 26
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.RESNET.FREQUENCY_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.FREQUENCY_DILATIONS = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.AUDIO_DATA.SAMPLING_RATE = 8000
    cfg.AUDIO_DATA.N_FFT = 256
    cfg.AUDIO_DATA.CLIP_SECS = 0.32
    cfg.AUDIO_DATA.NUM_FRAMES = 64
    cfg.AUDIO_DATA.NUM_FREQUENCIES = 32
    cfg.SLOWFAST.ALPHA = 4
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.DSP_PRECISION = "HIGHEST"
    cfg.TRAIN.DATASET = "Vggsound"
    cfg.WANDB.ENABLE = True  # gates the in-graph summariser
    cfg.LOG_PERIOD = 2
    return cfg


def _make_batch(rng, cfg, b=4, offset=0):
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    return {
        "waveform": (rng.standard_normal((b, clip)) * 0.1).astype(np.float32),
        "n_valid": np.full((b,), clip, np.int32),
        "labels": {"class_id": rng.integers(0, 6, (b,)).astype(np.int32)},
        "index": np.arange(b, dtype=np.int32) + offset,
    }


def test_watch_summary_shapes_and_counts():
    from asf_tpu.engine.steps import WATCH_BINS, watch_summary

    params = {"stem": {"conv": {"kernel": np.linspace(-1, 1, 48, dtype=np.float32)}}}
    grads = {"stem": {"conv": {"kernel": np.full((48,), 0.5, np.float32)}}}
    out = jax.tree.map(np.asarray, watch_summary(params, grads))
    assert set(out) == {"parameters/stem/conv/kernel", "gradients/stem/conv/kernel"}
    p = out["parameters/stem/conv/kernel"]
    assert p["counts"].shape == (WATCH_BINS,) and p["counts"].sum() == 48
    assert p["lo"] == -1.0 and p["hi"] == 1.0
    g = out["gradients/stem/conv/kernel"]
    # constant tensor: degenerate range, all mass in the first bin
    assert g["counts"].sum() == 48 and g["counts"][0] == 48


def test_train_step_emits_watch_at_log_period():
    from asf_tpu.engine.optimizer import construct_optimizer
    from asf_tpu.engine.steps import init_state, make_train_step
    from asf_tpu.models import build_model

    cfg = _tiny_cfg()
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, cfg)

    class _Lazy:
        tx = None

        def init(self, params):
            if self.tx is None:
                self.tx = construct_optimizer(cfg, params)
            return self.tx.init(params)

    lazy = _Lazy()
    model = build_model(cfg)
    state = init_state(cfg, model, lazy, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, model, lazy.tx)

    n_params = sum(x.size for x in jax.tree.leaves(state.params))

    # step 0: fresh (0 % 2 == 0); step 1: stale (zeros); step 2: fresh again
    freshness, param_mass = [], []
    for it in range(3):
        state, parts, _ = step(
            state, _make_batch(rng, cfg, offset=it), np.float32(0.01),
            jax.random.PRNGKey(1),
        )
        watch = jax.tree.map(np.asarray, parts["watch"])
        freshness.append(int(watch["_fresh"]))
        param_mass.append(
            sum(
                int(h["counts"].sum())
                for name, h in watch.items()
                if name != "_fresh" and name.startswith("parameters/")
            )
        )
    assert freshness == [1, 0, 1]
    # on fresh steps every parameter lands in some bin; stale steps are zeros
    assert param_mass[0] == n_params and param_mass[2] == n_params
    assert param_mass[1] == 0
    # gradients summarised for the same layer set
    names = {n for n in watch if n != "_fresh"}
    p_names = {n.split("/", 1)[1] for n in names if n.startswith("parameters/")}
    g_names = {n.split("/", 1)[1] for n in names if n.startswith("gradients/")}
    assert p_names == g_names and len(p_names) > 20


def test_train_epoch_routes_histograms_to_sink():
    """End-to-end: train_epoch's flush thread hands fresh histogram payloads
    to the scalar logger with the layer-name keys."""
    from asf_tpu.engine.optimizer import construct_optimizer
    from asf_tpu.engine.steps import (
        TrainState,
        init_state,
        make_train_multi_step,
        make_train_step,
    )
    from asf_tpu.engine.train_loop import build_train_meter, train_epoch
    from asf_tpu.models import build_model
    from asf_tpu.parallel.mesh import make_mesh, param_shardings, replicate_tree

    cfg = _tiny_cfg()
    cfg.TPU.DATA_PARALLEL = 2
    cfg.TPU.STEPS_PER_DISPATCH = 2
    cfg.TPU.PREFETCH_DEPTH = 2
    rng = np.random.default_rng(2)
    batches = [_make_batch(rng, cfg, offset=i) for i in range(3)]

    class _Loader(list):
        pass

    class _Sink:
        def __init__(self):
            self.hist_calls = []
            self.scalars = []

        def log(self, scalars, global_step=None):
            self.scalars.append((scalars, global_step))

        def log_histograms(self, hists, global_step=None):
            self.hist_calls.append((hists, global_step))

        def alert(self, *a, **k):
            pass

    class _Lazy:
        tx = None

        def init(self, params):
            if self.tx is None:
                self.tx = construct_optimizer(cfg, params)
            return self.tx.init(params)

    lazy = _Lazy()
    model = build_model(cfg)
    mesh = make_mesh(cfg)
    state = init_state(cfg, model, lazy, jax.random.PRNGKey(0), batches[0])
    state = TrainState(
        params=param_shardings(state.params, mesh),
        batch_stats=replicate_tree(state.batch_stats, mesh),
        opt_state=param_shardings(state.opt_state, mesh),
        step=state.step,
    )
    sink = _Sink()
    train_epoch(
        _Loader(batches), state, make_train_step(cfg, model, lazy.tx),
        build_train_meter(cfg, len(batches)), 0, cfg, mesh,
        jax.random.PRNGKey(1),
        scalar_logger=sink, multi_step=make_train_multi_step(cfg, model, lazy.tx),
    )
    # LOG_PERIOD=2 over 3 steps -> fresh at steps 0 and 2
    assert len(sink.hist_calls) == 2
    steps_logged = [gs for _, gs in sink.hist_calls]
    assert steps_logged == [0, 2]
    hists, _ = sink.hist_calls[0]
    some = next(iter(hists))
    assert some.startswith(("parameters/", "gradients/"))
    assert set(hists[some]) == {"counts", "lo", "hi"}
    assert np.asarray(hists[some]["counts"]).sum() > 0


def test_scalar_logger_reconstructs_wandb_histograms(monkeypatch):
    """ScalarLogger.log_histograms builds wandb.Histogram(np_histogram=...)
    with edges spanning [lo, hi]."""
    from asf_tpu.engine.observers import ScalarLogger

    captured = {}

    class _FakeHistogram:
        def __init__(self, np_histogram=None):
            self.np_histogram = np_histogram

    fake_wandb = types.SimpleNamespace(Histogram=_FakeHistogram)
    monkeypatch.setitem(sys.modules, "wandb", fake_wandb)

    class _FakeRun:
        def log(self, payload, step=None):
            captured["payload"] = payload
            captured["step"] = step

    lg = ScalarLogger.__new__(ScalarLogger)
    lg.tb = None
    lg.wandb_run = _FakeRun()

    counts = np.zeros(64, np.int32)
    counts[0], counts[-1] = 3, 5
    lg.log_histograms(
        {"parameters/stem/kernel": {"counts": counts, "lo": -2.0, "hi": 2.0}},
        global_step=7,
    )
    assert captured["step"] == 7
    h = captured["payload"]["parameters/stem/kernel"]
    got_counts, got_edges = h.np_histogram
    assert got_counts.sum() == 8 and got_counts[0] == 3 and got_counts[-1] == 5
    assert got_edges[0] == -2.0 and got_edges[-1] == 2.0 and len(got_edges) == 65


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
