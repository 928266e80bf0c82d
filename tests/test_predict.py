"""End-to-end smoke of the one-off inference CLI (asf_tpu/tools/predict.py),
the reference's tools/predict.py counterpart: wav file in (with host
resampling), Orbax checkpoint loaded through the test precedence chain,
fully-convolutional eval forward, score-heatmap png out."""

import os

import numpy as np
import pytest

from fixtures import make_epic_fixture, tiny_cfg


@pytest.mark.slow
def test_predict_cli_end_to_end(tmp_path):
    import jax
    from scipy.io import wavfile

    from asf_tpu.checkpoint import manager as cu
    from asf_tpu.engine.steps import TrainState
    from asf_tpu.models import build_model
    from asf_tpu.tools import predict

    root = str(tmp_path)
    make_epic_fixture(root, n_videos=1, video_secs=2.0, n_records=2)
    cfg = tiny_cfg(root)
    cfg.OUTPUT_DIR = os.path.join(root, "out")
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    # a 1.0 s wav at a DIFFERENT rate: exercises the linear-resample path;
    # longer than CLIP_SECS so t_out > NUM_FRAMES exercises the
    # fully-convolutional (variable-T) forward and the ALPHA rounding.
    sr_in = 16000
    rng = np.random.default_rng(0)
    wav_path = os.path.join(root, "clip.wav")
    wavfile.write(
        wav_path, sr_in, (rng.standard_normal(sr_in) * 3000).astype(np.int16)
    )

    # save an Orbax checkpoint from an init state and point TEST at it
    model = build_model(cfg)
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    dummy = [
        np.zeros((1, cfg.AUDIO_DATA.NUM_FRAMES // cfg.SLOWFAST.ALPHA,
                  cfg.AUDIO_DATA.NUM_FREQUENCIES, 1), np.float32),
        np.zeros((1, cfg.AUDIO_DATA.NUM_FRAMES,
                  cfg.AUDIO_DATA.NUM_FREQUENCIES, 1), np.float32),
    ]
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state={},
        step=0,
    )
    ckpt = cu.save_checkpoint(cfg.OUTPUT_DIR, state, epoch=0, cfg=cfg)

    yaml_path = os.path.join(root, "cfg.yaml")
    with open(yaml_path, "w") as f:
        f.write(cfg.dump())

    preds = predict.main(
        [wav_path, "--cfg", yaml_path, "TEST.CHECKPOINT_FILE_PATH", ckpt]
    )

    assert len(preds) == 2  # verb + noun heads
    for p, n_cls in zip(preds, cfg.MODEL.NUM_CLASSES):
        assert p.shape[-1] == n_cls
        assert np.all(np.isfinite(p))
    # 1 s of 8 kHz audio -> ~100 frames > NUM_FRAMES=64, rounded to ALPHA
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "predict_scores.png"))


@pytest.mark.slow
def test_predict_rejects_gru_configs(tmp_path):
    from asf_tpu.tools import predict

    root = str(tmp_path)
    make_epic_fixture(root, n_videos=1, video_secs=2.0, n_records=2)
    cfg = tiny_cfg(root, gru=True)
    yaml_path = os.path.join(root, "cfg.yaml")
    with open(yaml_path, "w") as f:
        f.write(cfg.dump())
    with pytest.raises(SystemExit, match="single-clip"):
        predict.main([os.path.join(root, "nope.wav"), "--cfg", yaml_path])
