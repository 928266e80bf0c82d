"""Fused eval path (in-graph masked metrics + K-batch scan dispatch,
engine/eval_loop.py _eval_fused) must produce the same epoch stats as the
legacy per-batch path, including padded tail batches."""

import numpy as np
import jax
import pytest

from asf_tpu.config import get_cfg


def _cfg():
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
    cfg.TPU.STEPS_PER_DISPATCH = 2
    cfg.TRAIN.DATASET = "Vggsound"
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.LOG_PERIOD = 2
    return cfg


class _Loader(list):
    batch_size = 4


def test_fused_eval_matches_legacy():
    from asf_tpu.engine.eval_loop import build_val_meter, eval_epoch
    from asf_tpu.engine.steps import (
        init_state,
        make_eval_metrics_step,
        make_eval_multi_step,
        make_eval_step,
    )
    from asf_tpu.models import build_model

    cfg = _cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1

    def mk(b, off):
        return {
            "waveform": (rng.standard_normal((b, clip)) * 0.1).astype(np.float32),
            "n_valid": np.full((b,), clip, np.int32),
            "labels": {"class_id": rng.integers(0, 6, (b,)).astype(np.int32)},
            "index": np.arange(b, dtype=np.int32) + off,
            "metadata": {},
        }

    # 5 batches: 2 macro pairs of 4 + one ragged tail of 3 (padded)
    batches = [mk(4, 0), mk(4, 4), mk(4, 8), mk(4, 12), mk(3, 16)]

    class _Lazy:
        def init(self, params):
            import optax

            return optax.sgd(0.1).init(params)

    state = init_state(cfg, model, _Lazy(), jax.random.PRNGKey(0), batches[0])

    eval_step = make_eval_step(cfg, model)
    meter_a = build_val_meter(cfg, len(batches))
    _, top1_a = eval_epoch(
        _Loader([{k: (dict(v) if isinstance(v, dict) else v.copy()) for k, v in b.items()} for b in batches]),
        state, eval_step, meter_a, 0, cfg,
    )

    metrics_step = make_eval_metrics_step(cfg, model)
    multi = make_eval_multi_step(cfg, model)
    meter_b = build_val_meter(cfg, len(batches))
    _, top1_b = eval_epoch(
        _Loader([{k: (dict(v) if isinstance(v, dict) else v.copy()) for k, v in b.items()} for b in batches]),
        state, None, meter_b, 0, cfg,
        metrics_step=metrics_step, multi_metrics_step=multi,
    )

    assert set(top1_a.keys()) == set(top1_b.keys())
    for k in top1_a:
        np.testing.assert_allclose(
            float(top1_a[k]), float(top1_b[k]), rtol=1e-5, atol=1e-4, err_msg=k
        )


def test_fused_eval_mixed_shapes_no_crash():
    """A macro group must never straddle a shape change (GRU window-count
    bucketing yields differing waveform shapes): the fused path dispatches
    the partial group as singles instead of crashing in np.stack
    (ADVICE r2 high)."""
    from asf_tpu.engine.eval_loop import build_val_meter, eval_epoch
    from asf_tpu.engine.steps import (
        init_state,
        make_eval_metrics_step,
        make_eval_multi_step,
        make_eval_step,
    )
    from asf_tpu.models import build_model

    cfg = _cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(1)
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    short = clip // 2  # a second waveform shape (shorter bucket)

    def mk(b, off, s):
        return {
            "waveform": (rng.standard_normal((b, s)) * 0.1).astype(np.float32),
            "n_valid": np.full((b,), s, np.int32),
            "labels": {"class_id": rng.integers(0, 6, (b,)).astype(np.int32)},
            "index": np.arange(b, dtype=np.int32) + off,
            "metadata": {},
        }

    # group=2; the shape change hits mid-group: [clip, SHORT], [short, clip]
    batches = [mk(4, 0, clip), mk(4, 4, short), mk(4, 8, short), mk(4, 12, clip)]

    class _Lazy:
        def init(self, params):
            import optax

            return optax.sgd(0.1).init(params)

    state = init_state(cfg, model, _Lazy(), jax.random.PRNGKey(0), batches[0])

    def copies():
        return _Loader(
            [{k: (dict(v) if isinstance(v, dict) else v.copy()) for k, v in b.items()}
             for b in batches]
        )

    meter_a = build_val_meter(cfg, len(batches))
    _, top1_a = eval_epoch(copies(), state, make_eval_step(cfg, model), meter_a, 0, cfg)

    meter_b = build_val_meter(cfg, len(batches))
    _, top1_b = eval_epoch(
        copies(), state, None, meter_b, 0, cfg,
        metrics_step=make_eval_metrics_step(cfg, model),
        multi_metrics_step=make_eval_multi_step(cfg, model),
    )

    for k in top1_a:
        np.testing.assert_allclose(
            float(top1_a[k]), float(top1_b[k]), rtol=1e-5, atol=1e-4, err_msg=k
        )


def test_fused_eval_dtype_change_not_stacked():
    """A same-shape dtype flip (int16-PCM batch amid float32 ones, the
    TPU.INT16_TRANSFER probe-rescue case) must split the macro group: a
    plain np.stack would promote raw PCM to float32 WITHOUT the deferred
    /32768 and feed ~32768x-amplitude rows to the model. Fused must equal
    the legacy per-batch path, which handles each dtype correctly."""
    from asf_tpu.engine.eval_loop import build_val_meter, eval_epoch
    from asf_tpu.engine.steps import (
        init_state,
        make_eval_metrics_step,
        make_eval_multi_step,
        make_eval_step,
    )
    from asf_tpu.models import build_model

    cfg = _cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(5)
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1

    def mk_f32(b, off):
        return {
            "waveform": (rng.standard_normal((b, clip)) * 0.1).astype(np.float32),
            "n_valid": np.full((b,), clip, np.int32),
            "labels": {"class_id": rng.integers(0, 6, (b,)).astype(np.int32)},
            "index": np.arange(b, dtype=np.int32) + off,
            "metadata": {},
        }

    def mk_i16(b, off):
        d = mk_f32(b, off)
        d["waveform"] = rng.integers(-3000, 3000, (b, clip)).astype(np.int16)
        return d

    # group=2; the dtype change hits mid-group: [f32, I16], [i16, f32]
    batches = [mk_f32(4, 0), mk_i16(4, 4), mk_i16(4, 8), mk_f32(4, 12)]

    class _Lazy:
        def init(self, params):
            import optax

            return optax.sgd(0.1).init(params)

    state = init_state(cfg, model, _Lazy(), jax.random.PRNGKey(0), batches[0])

    def copies():
        return _Loader(
            [{k: (dict(v) if isinstance(v, dict) else v.copy()) for k, v in b.items()}
             for b in batches]
        )

    meter_a = build_val_meter(cfg, len(batches))
    _, top1_a = eval_epoch(copies(), state, make_eval_step(cfg, model), meter_a, 0, cfg)

    # Mechanism guard: every stacked macro group must be dtype-uniform —
    # top-1 on a random tiny model is too coarse to see the 32768x amplitude
    # corruption, so assert the grouping itself.
    import asf_tpu.engine.eval_loop as el

    real_stack = el._stack_batches

    def checked_stack(grp):
        dts = {str(b["waveform"].dtype) for b in grp}
        assert len(dts) == 1, f"mixed-dtype macro group stacked: {dts}"
        return real_stack(grp)

    el._stack_batches = checked_stack
    try:
        meter_b = build_val_meter(cfg, len(batches))
        _, top1_b = eval_epoch(
            copies(), state, None, meter_b, 0, cfg,
            metrics_step=make_eval_metrics_step(cfg, model),
            multi_metrics_step=make_eval_multi_step(cfg, model),
        )
    finally:
        el._stack_batches = real_stack

    for k in top1_a:
        np.testing.assert_allclose(
            float(top1_a[k]), float(top1_b[k]), rtol=1e-5, atol=1e-4, err_msg=k
        )



if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
