"""Grouped test dispatch (engine/test_loop.py perform_test with multi_eval):
scanned K-batch scoring must finalize to exactly the legacy per-batch
metrics, including the padded tail and multi-view ensembling."""

import numpy as np
import jax
import pytest

import sys

sys.path.insert(0, "tests")

from test_multi_step import _make_batch, _tiny_cfg  # noqa: E402


class _Loader(list):
    batch_size = 4


def _batches(cfg, num_clips):
    # 9 clips x num_clips views -> 18 items, batch 4 -> 4 full + 1 ragged(2)
    rng = np.random.default_rng(7)
    n_items = 9 * num_clips
    items = []
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    for i in range(n_items):
        audio_id = i // num_clips
        items.append(
            {
                "waveform": (rng.standard_normal(clip) * 0.1).astype(np.float32),
                "n_valid": np.int32(clip),
                "class_id": audio_id % 6,
                "index": i,
            }
        )
    out = []
    for b0 in range(0, n_items, 4):
        chunk = items[b0 : b0 + 4]
        out.append(
            {
                "waveform": np.stack([it["waveform"] for it in chunk]),
                "n_valid": np.asarray([it["n_valid"] for it in chunk], np.int32),
                "labels": {
                    "class_id": np.asarray([it["class_id"] for it in chunk], np.int64)
                },
                "index": np.asarray([it["index"] for it in chunk], np.int64),
                "metadata": {},
            }
        )
    return out


def test_grouped_perform_test_matches_legacy():
    from asf_tpu.engine.meters import TestMeter
    from asf_tpu.engine.steps import (
        init_state,
        make_eval_multi_step,
        make_eval_step,
    )
    from asf_tpu.engine.test_loop import perform_test
    from asf_tpu.models import build_model
    from asf_tpu.parallel.mesh import make_mesh

    cfg = _tiny_cfg()
    cfg.TPU.DATA_PARALLEL = 2
    cfg.TPU.STEPS_PER_DISPATCH = 2
    num_clips = 2
    batches = _batches(cfg, num_clips)

    class _Lazy:
        def init(self, params):
            import optax

            return optax.sgd(0.1).init(params)

    model = build_model(cfg)
    mesh = make_mesh(cfg)
    state = init_state(cfg, model, _Lazy(), jax.random.PRNGKey(0), batches[0])
    eval_step = make_eval_step(cfg, model)
    multi_eval = make_eval_multi_step(cfg, model)

    def run(multi):
        meter = TestMeter(
            num_audios=9,
            num_clips=num_clips,
            num_cls=cfg.MODEL.NUM_CLASSES[0],
            overall_iters=len(batches),
            ensemble_method="sum",
        )
        loader = _Loader(
            [{k: (dict(v) if isinstance(v, dict) else v.copy()) for k, v in b.items()} for b in batches]
        )
        return perform_test(
            loader, state, eval_step, meter, cfg, mesh,
            multi_eval=multi_eval if multi else None,
        )

    preds_a, labels_a = run(multi=False)
    preds_b, labels_b = run(multi=True)
    np.testing.assert_array_equal(np.asarray(labels_a), np.asarray(labels_b))
    np.testing.assert_allclose(
        np.asarray(preds_a), np.asarray(preds_b), rtol=1e-5, atol=1e-5
    )


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
