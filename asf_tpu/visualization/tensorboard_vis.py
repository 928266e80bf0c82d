"""TensorBoard writer.

Parity with /root/reference/audio_slowfast/visualization/tensorboard_vis.py:17-248:
scalar dicts, eval plots, confusion matrices/histograms with class-name
mapping. Uses torch.utils.tensorboard (torch is a baked CPU dependency).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from asf_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class TensorboardWriter:
    def __init__(self, cfg):
        from torch.utils.tensorboard import SummaryWriter

        if cfg.TENSORBOARD.LOG_DIR == "":
            log_dir = os.path.join(cfg.OUTPUT_DIR, f"runs-{cfg.TRAIN.DATASET}")
        else:
            log_dir = os.path.join(cfg.OUTPUT_DIR, cfg.TENSORBOARD.LOG_DIR)
        self.writer = SummaryWriter(log_dir=log_dir)
        self.cfg = cfg
        logger.info("TensorBoard events will be saved to %s", log_dir)

    def add_scalars(self, data_dict: Dict[str, float], global_step: Optional[int] = None):
        for key, item in data_dict.items():
            if isinstance(item, (int, float)):
                self.writer.add_scalar(key, item, global_step)

    def add_confusion_matrix(self, preds, labels, tag="Confusion Matrix",
                             num_classes=None, global_step=None, class_names=None):
        from .plots import plot_confusion_matrix
        import numpy as np

        cm = confusion_matrix_counts(np.asarray(preds), np.asarray(labels), num_classes)
        fig = plot_confusion_matrix(cm, class_names=class_names)
        self.writer.add_figure(tag=tag, figure=fig, global_step=global_step)

    def add_topk_histograms(self, preds, labels, k=10, global_step=None,
                            class_names=None):
        """Per-class top-k score histograms (plot_hist_2d parity,
        visualization/tensorboard_vis.py:193-248 — rendered as figures)."""
        from .plots import plot_topk_histogram
        import numpy as np

        preds = np.asarray(preds)
        labels = np.asarray(labels)
        for cls in np.unique(labels):
            mask = labels == cls
            mean_scores = preds[mask].mean(axis=0)
            tag = (
                f"Val/topk_hist/{class_names[int(cls)]}"
                if class_names
                else f"Val/topk_hist/class_{int(cls)}"
            )
            fig = plot_topk_histogram(
                tag, np.sort(mean_scores)[::-1][:k], k=k, class_names=None
            )
            self.writer.add_figure(tag=tag, figure=fig, global_step=global_step)

    def flush(self):
        self.writer.flush()

    def close(self):
        self.writer.flush()
        self.writer.close()


def confusion_matrix_counts(preds, labels, num_classes=None):
    import numpy as np

    preds = np.asarray(preds)
    if preds.ndim == 2:
        preds = preds.argmax(axis=1)
    labels = np.asarray(labels)
    n = num_classes or int(max(preds.max(), labels.max())) + 1
    cm = np.zeros((n, n), np.int64)
    for p, t in zip(preds, labels):
        cm[int(t), int(p)] += 1
    return cm
