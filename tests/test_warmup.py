"""AOT warm-up (engine/warmup.py, VERDICT r3 next-step #7).

``warm_compile`` must lower+compile every program ``train(cfg)`` dispatches
— per GRU bucket — without executing a step (state untouched), and a train
run with TPU.WARM_COMPILE_ON_START must produce the same result as without.
"""

import numpy as np
import jax
import pytest

from asf_tpu.config import get_cfg


def _tiny_cfg(gru=False):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "AudioSlowFastGRU" if gru else "AudioSlowFast"
    # the GRU chain model is multi-task only (models/gru.py head assert)
    cfg.MODEL.NUM_CLASSES = [6, 8] if gru else [6]
    cfg.MODEL.ONLY_ACTION_RECOGNITION = True  # no PDDL attribute csv needed
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
    cfg.AUDIO_DATA.MAX_NB_SPECTROGRAMS = 4
    cfg.SLOWFAST.ALPHA = 4
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.DSP_PRECISION = "HIGHEST"
    cfg.TPU.INT16_TRANSFER = False
    cfg.TRAIN.DATASET = "Vggsound"
    cfg.TRAIN.BATCH_SIZE = 4
    return cfg


def test_gru_buckets():
    from asf_tpu.engine.warmup import gru_buckets

    cfg = _tiny_cfg(gru=True)
    cfg.TPU.GRU_SINGLE_BUCKET = True
    assert gru_buckets(cfg) == [4]
    cfg.TPU.GRU_SINGLE_BUCKET = False
    assert gru_buckets(cfg) == [1, 2, 4]
    cfg.AUDIO_DATA.MAX_NB_SPECTROGRAMS = 15
    assert gru_buckets(cfg) == [1, 2, 4, 8, 15]


def test_canonical_batches_shapes():
    from asf_tpu.engine.warmup import canonical_batches

    cfg = _tiny_cfg()
    clip = int(round(8000 * 0.32)) - 1
    (b,) = canonical_batches(cfg, 4, int16=False)
    assert b["waveform"].shape == (4, clip) and b["waveform"].dtype == np.float32

    cfg = _tiny_cfg(gru=True)
    cfg.TPU.GRU_SINGLE_BUCKET = False
    bs = canonical_batches(cfg, 4, int16=True)
    assert [x["waveform"].shape[1] for x in bs] == [1, 2, 4]
    assert all(x["waveform"].dtype == np.int16 for x in bs)
    assert all({"verb", "noun"} <= set(x["labels"]) for x in bs)


def test_warm_compile_counts_and_leaves_state_untouched():
    from asf_tpu.engine.steps import (
        TrainState,
        init_state,
        lazy_optimizer,
        make_eval_metrics_step,
        make_eval_multi_step,
        make_train_multi_step,
        make_train_step,
    )
    from asf_tpu.engine.warmup import canonical_batches, warm_compile
    from asf_tpu.models import build_model
    from asf_tpu.parallel.mesh import make_mesh, param_shardings, replicate_tree

    cfg = _tiny_cfg(gru=True)
    cfg.TPU.DATA_PARALLEL = 2
    cfg.TPU.STEPS_PER_DISPATCH = 2
    cfg.TPU.GRU_SINGLE_BUCKET = False  # 3 buckets -> 3x the program set

    model = build_model(cfg)
    mesh = make_mesh(cfg)
    lazy = lazy_optimizer(cfg)
    example = canonical_batches(cfg, cfg.TRAIN.BATCH_SIZE, int16=False)[-1]
    state = init_state(cfg, model, lazy, jax.random.PRNGKey(0), example)
    state = TrainState(
        params=param_shardings(state.params, mesh),
        batch_stats=replicate_tree(state.batch_stats, mesh),
        opt_state=param_shardings(state.opt_state, mesh),
        step=state.step,
    )
    before = jax.device_get(state.params)

    n = warm_compile(
        cfg, mesh, state,
        make_train_step(cfg, model, lazy.tx),
        make_train_multi_step(cfg, model, lazy.tx),
        make_eval_metrics_step(cfg, model),
        make_eval_multi_step(cfg, model),
    )
    assert n == 3 * 4  # 3 buckets x (train single, train K, eval, eval K)
    # AOT compile executes nothing: params bit-identical, step counter at 0
    after = jax.device_get(state.params)
    jax.tree.map(np.testing.assert_array_equal, before, after)
    assert int(jax.device_get(state.step)) == 0


@pytest.mark.slow
def test_train_with_warm_compile_matches_without(tmp_path):
    """train(cfg) with TPU.WARM_COMPILE_ON_START=True must produce the same
    final params as without (the warm pass is side-effect-free)."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from fixtures import make_epic_fixture, tiny_cfg

    from asf_tpu.engine.train_loop import train

    results = []
    for warm in (False, True):
        root = str(tmp_path / ("warm" if warm else "cold"))
        make_epic_fixture(root)
        cfg = tiny_cfg(root)
        cfg.OUTPUT_DIR = root
        cfg.TPU.STEPS_PER_DISPATCH = 2
        cfg.TPU.WARM_COMPILE_ON_START = warm
        state = train(cfg)
        results.append(jax.device_get(state.params))
    jax.tree.map(np.testing.assert_array_equal, results[0], results[1])


def test_warm_marker_path_keys_and_inertness():
    """warm_marker_path: None without a persistent cache dir (tests/CPU);
    with one, a stable digest that moves when program-shaping config moves
    (VERDICT r4 #5 — the cold-cache detector behind auto-warm)."""
    from asf_tpu.engine.warmup import warm_marker_path

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "AudioSlowFast"
    cfg.MODEL.NUM_CLASSES = [10]
    had = getattr(jax.config, "jax_compilation_cache_dir", None)
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        assert warm_marker_path(cfg, int16=False) is None
        jax.config.update("jax_compilation_cache_dir", "/tmp/warm_marker_t")
        p1 = warm_marker_path(cfg, int16=False)
        p2 = warm_marker_path(cfg, int16=False)
        assert p1 is not None and p1 == p2
        assert str(p1).startswith("/tmp/warm_marker_t")
        cfg.TRAIN.BATCH_SIZE += 1
        assert warm_marker_path(cfg, int16=False) != p1
        cfg.TRAIN.BATCH_SIZE -= 1
        cfg.TPU.STEPS_PER_DISPATCH += 1
        assert warm_marker_path(cfg, int16=False) != p1
        assert warm_marker_path(cfg, int16=True) != warm_marker_path(
            cfg, int16=False
        )
    finally:
        jax.config.update("jax_compilation_cache_dir", had)


@pytest.mark.slow
def test_auto_warm_on_cold_cache(tmp_path, monkeypatch):
    """With a persistent cache dir configured and no marker, train(cfg) runs
    the warm-up phase unasked and writes the marker; a second run skips it."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from fixtures import make_epic_fixture, tiny_cfg

    import asf_tpu.engine.warmup as warmup_mod
    from asf_tpu.engine.train_loop import train

    calls = []
    real = warmup_mod.warm_compile
    monkeypatch.setattr(
        warmup_mod, "warm_compile", lambda *a, **k: calls.append(1) or real(*a, **k)
    )
    had = getattr(jax.config, "jax_compilation_cache_dir", None)
    try:
        jax.config.update("jax_compilation_cache_dir", str(tmp_path / "cc"))
        root = str(tmp_path / "data")
        make_epic_fixture(root)
        cfg = tiny_cfg(root)
        cfg.OUTPUT_DIR = str(tmp_path / "out")
        cfg.TPU.STEPS_PER_DISPATCH = 2
        assert cfg.TPU.WARM_COMPILE_ON_START is False
        assert cfg.TPU.AUTO_WARM_ON_COLD_CACHE is True
        train(cfg)
        assert calls == [1], "cold cache must trigger exactly one warm-up"
        import shutil

        shutil.rmtree(cfg.OUTPUT_DIR)  # re-run training, not auto-resume
        train(cfg)
        assert calls == [1], "marker present: second run must skip warm-up"
    finally:
        jax.config.update("jax_compilation_cache_dir", had)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
