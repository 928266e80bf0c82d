"""Visualization subsystem smoke tests (tensorboard_vis + plots): hermetic,
Agg backend, asserts event files / figures are actually produced.
Parity target: /root/reference/audio_slowfast/visualization/."""

import os

import numpy as np


def _tiny_cfg(root):
    from asf_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.OUTPUT_DIR = root
    cfg.TENSORBOARD.ENABLE = True
    cfg.TRAIN.DATASET = "Vggsound"
    return cfg


def test_tensorboard_writer_scalars_and_cm(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from asf_tpu.visualization.tensorboard_vis import TensorboardWriter

    cfg = _tiny_cfg(str(tmp_path))
    w = TensorboardWriter(cfg)
    w.add_scalars({"Train/loss": 1.25, "Train/lr": 0.1, "skipme": "str"}, global_step=3)
    preds = np.array([0, 1, 2, 1])
    labels = np.array([0, 1, 1, 1])
    w.add_confusion_matrix(preds, labels, num_classes=3, global_step=3)
    w.flush()
    w.close()

    log_dir = os.path.join(str(tmp_path), "runs-Vggsound")
    events = [f for f in os.listdir(log_dir) if "events" in f]
    assert events, "no tensorboard event file written"
    assert os.path.getsize(os.path.join(log_dir, events[0])) > 0


def test_plot_helpers_return_figures():
    import matplotlib

    matplotlib.use("Agg")
    from asf_tpu.visualization.plots import (
        plot_confusion_matrix,
        plot_spectrogram,
        plot_topk_histogram,
        plot_waveform,
    )

    cm = np.array([[5, 1], [2, 7]], dtype=np.int64)
    fig = plot_confusion_matrix(cm, class_names=["a", "b"])
    assert fig is not None

    fig = plot_topk_histogram("Top verbs", np.random.rand(20), k=5)
    assert fig is not None

    spec = np.random.randn(64, 32).astype(np.float32)
    assert plot_spectrogram(spec, sr=8000, hop=40) is not None
    assert plot_waveform(np.random.randn(8000), 8000) is not None
