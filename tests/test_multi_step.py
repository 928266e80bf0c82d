"""Multi-step dispatch (engine/steps.py make_train_multi_step): one scanned
K-step dispatch must be numerically identical to K sequential single-step
dispatches — same params, batch_stats, step counter, and per-step metrics.

Also covers the loader's macro-batch grouping (data/loader.py
DevicePrefetcher group mode): stacking, tagging, shape-change splits, and
epoch-tail remainders.
"""

import numpy as np
import jax
import jax.numpy as jnp
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
    return cfg


def _make_batch(rng, cfg, b=4, offset=0):
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    return {
        "waveform": (rng.standard_normal((b, clip)) * 0.1 + offset * 0.01).astype(
            np.float32
        ),
        "n_valid": np.full((b,), clip, np.int32),
        "labels": {"class_id": rng.integers(0, 6, (b,)).astype(np.int32)},
        "index": np.arange(b, dtype=np.int32) + offset,
    }


def test_multi_step_matches_sequential_singles():
    from asf_tpu.engine.optimizer import construct_optimizer
    from asf_tpu.engine.steps import (
        init_state,
        make_train_multi_step,
        make_train_step,
    )
    from asf_tpu.models import build_model

    cfg = _tiny_cfg()
    # SpecAugment's faithful value-as-coordinate warp (dsp/specaugment.py:59)
    # makes step i>0 chaotically sensitive to step i-1's params: per-op
    # compile-order float noise (~1e-7 between the scanned and single
    # programs, K=1 assert below) amplified through it broke this test's
    # chained asserts whenever XLA's fusion choices shifted (observed at the
    # r4 maxpool-VJP landing). Dispatch plumbing — batch order, lr routing,
    # per-step rng threading (dropout still folds rng with state.step),
    # step counter — is what this test pins; augment parity has its own
    # oracle (tests/test_specaugment.py).
    cfg.TPU.SPEC_AUGMENT = False
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batches = [_make_batch(rng, cfg, offset=i) for i in range(2)]

    class _Lazy:
        tx = None

        def init(self, params):
            if self.tx is None:
                self.tx = construct_optimizer(cfg, params)
            return self.tx.init(params)

    def fresh_state(lazy):
        return init_state(cfg, model, lazy, jax.random.PRNGKey(0), batches[0])

    key = jax.random.PRNGKey(3)
    # small LRs: at lr=0.1 this random-init tiny model has exploding grads,
    # which amplifies compile-order float noise into the parameters
    lrs = [0.01, 0.005]

    lazy_a = _Lazy()
    state_a = fresh_state(lazy_a)
    single = make_train_step(cfg, model, lazy_a.tx)
    parts_seq, stats_seq = [], []
    for b, lr in zip(batches, lrs):
        state_a, parts, stats = single(
            state_a, jax.tree.map(jnp.asarray, b), jnp.float32(lr), key
        )
        parts_seq.append(jax.device_get(parts))
        stats_seq.append(jax.device_get(stats))

    lazy_b = _Lazy()
    state_b = fresh_state(lazy_b)
    multi = make_train_multi_step(cfg, model, lazy_b.tx)
    macro = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *batches)
    state_b, parts_m, stats_m = multi(
        state_b, macro, jnp.asarray(lrs, jnp.float32), key
    )
    parts_m, stats_m = jax.device_get((parts_m, stats_m))

    assert int(state_b.step) == 2 == int(state_a.step)
    for i in range(2):
        # Step 0 consumes identical params -> tight. Step i>0 metrics are
        # functions of step-(i-1)'s params, which carry per-op compile-order
        # float noise (~1e-7, K=1 assert below) through SGD+BN; grad_norm is
        # the most sensitive metric. A wiring bug (wrong batch order / lr /
        # rng) still produces O(1) differences.
        rtol, atol = (2e-4, 1e-4) if i == 0 else (1e-2, 1e-3)
        for k, v in parts_seq[i].items():
            np.testing.assert_allclose(
                parts_m[k][i], v, rtol=rtol, atol=atol, err_msg=f"parts[{k}] step {i}"
            )
        for k, v in stats_seq[i].items():
            np.testing.assert_allclose(
                stats_m[k][i], v, rtol=rtol, atol=atol, err_msg=f"stats[{k}] step {i}"
            )
    # Params after two chained steps: SGD+BN amplify per-op compile-order
    # float noise (~1e-7, see the K=1 assert below) to ~1e-4, so this only
    # guards against wiring bugs (wrong batch order / lr / rng), which
    # produce O(1) differences.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-2, atol=2e-3),
        jax.device_get(state_a.params),
        jax.device_get(state_b.params),
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-2, atol=2e-3),
        jax.device_get(state_a.batch_stats),
        jax.device_get(state_b.batch_stats),
    )

    # K=1 scan vs single dispatch IS tight (no chained amplification):
    lazy_c = _Lazy()
    state_c = fresh_state(lazy_c)
    single_c = make_train_step(cfg, model, lazy_c.tx)
    state_c, _, _ = single_c(
        state_c, jax.tree.map(jnp.asarray, batches[0]), jnp.float32(lrs[0]), key
    )
    lazy_d = _Lazy()
    state_d = fresh_state(lazy_d)
    multi_d = make_train_multi_step(cfg, model, lazy_d.tx)
    state_d, _, _ = multi_d(
        state_d,
        jax.tree.map(lambda x: jnp.asarray(x)[None], batches[0]),
        jnp.asarray(lrs[:1], jnp.float32),
        key,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-5),
        jax.device_get(state_c.params),
        jax.device_get(state_d.params),
    )


def test_prefetcher_macro_grouping():
    from asf_tpu.data.loader import DevicePrefetcher

    cfg = _tiny_cfg()
    rng = np.random.default_rng(1)
    # 5 batches of one shape -> macro(2), macro(2), single tail
    batches = [_make_batch(rng, cfg, offset=i) for i in range(5)]
    out = list(DevicePrefetcher(iter(batches), depth=2, group=2))
    kinds = [k for k, _, _ in out]
    assert kinds == ["macro", "macro", "single"]
    macro0 = out[0][1]
    assert macro0["waveform"].shape[0] == 2
    np.testing.assert_array_equal(
        np.asarray(macro0["waveform"][1]), batches[1]["waveform"]
    )
    np.testing.assert_array_equal(
        np.asarray(macro0["labels"]["class_id"][0]), batches[0]["labels"]["class_id"]
    )

    # a shape change mid-stream splits the group (GRU bucket semantics)
    mixed = [
        _make_batch(rng, cfg, b=4, offset=0),
        _make_batch(rng, cfg, b=2, offset=1),
        _make_batch(rng, cfg, b=2, offset=2),
    ]
    out = list(DevicePrefetcher(iter(mixed), depth=2, group=2))
    assert [k for k, _, _ in out] == ["single", "macro"]
    assert out[1][1]["waveform"].shape[:2] == (2, 2)

    # metadata is dropped from macro batches, kept on singles
    withmeta = [dict(b, metadata={"id": [f"x{i}"]}) for i, b in enumerate(batches[:3])]
    out = list(DevicePrefetcher(iter(withmeta), depth=2, group=2))
    assert "metadata" not in out[0][1] and "metadata" in out[1][1]


def test_train_epoch_multi_dispatch(tmp_path):
    """train_epoch with STEPS_PER_DISPATCH=2 runs macro + tail-single paths
    and feeds the meter the same per-iter stats count as single dispatch."""
    from asf_tpu.engine.optimizer import construct_optimizer
    from asf_tpu.engine.steps import (
        init_state,
        make_train_multi_step,
        make_train_step,
    )
    from asf_tpu.engine.train_loop import build_train_meter, train_epoch
    from asf_tpu.models import build_model
    from asf_tpu.parallel.mesh import make_mesh, param_shardings, replicate_tree
    from asf_tpu.engine.steps import TrainState

    cfg = _tiny_cfg()
    cfg.TPU.DATA_PARALLEL = 2
    cfg.TPU.STEPS_PER_DISPATCH = 2
    cfg.TPU.PREFETCH_DEPTH = 2
    cfg.LOG_PERIOD = 2
    rng_np = np.random.default_rng(2)
    batches = [_make_batch(rng_np, cfg, offset=i) for i in range(3)]  # odd: 1 tail

    class _Loader(list):
        pass

    loader = _Loader(batches)

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
    single = make_train_step(cfg, model, lazy.tx)
    multi = make_train_multi_step(cfg, model, lazy.tx)
    meter = build_train_meter(cfg, len(loader))

    state = train_epoch(
        loader, state, single, meter, 0, cfg, mesh, jax.random.PRNGKey(1),
        multi_step=multi,
    )
    assert int(jax.device_get(state.step)) == 3


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
