"""Scalar observability sinks: TensorBoard + Weights & Biases.

Unifies the reference's two logging paths — TensorboardWriter scalars and
the per-iteration ``wandb.log`` calls sprinkled through
/root/reference/audio_slowfast/tools/train_net.py:560-607,748-771 — behind
one ``ScalarLogger`` with resume-by-RUN_ID semantics. Both sinks are
optional and failures degrade to logging a warning (no hard deps).
"""

from __future__ import annotations

from typing import Dict, Optional

from asf_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class ScalarLogger:
    """Fan-out scalar sink; enabled sinks follow cfg.TENSORBOARD / cfg.WANDB."""

    def __init__(self, cfg):
        self.tb = None
        self.wandb_run = None

        if cfg.TENSORBOARD.ENABLE:
            try:
                from asf_tpu.visualization.tensorboard_vis import TensorboardWriter

                self.tb = TensorboardWriter(cfg)
            except Exception as e:
                logger.warning("TensorBoard disabled: %s", e)

        if cfg.WANDB.ENABLE:
            try:
                import wandb

                kwargs = dict(
                    project="audio-slowfast-tpu",
                    config=_cfg_to_dict(cfg),
                    dir=cfg.OUTPUT_DIR,
                )
                if cfg.WANDB.RUN_ID:
                    # resume semantics of train_net.py:755-761
                    kwargs.update(id=cfg.WANDB.RUN_ID, resume="must")
                self.wandb_run = wandb.init(**kwargs)
            except Exception as e:
                logger.warning("wandb disabled: %s", e)

    def log(self, scalars: Dict[str, float], global_step: Optional[int] = None):
        if self.tb is not None:
            self.tb.add_scalars(scalars, global_step=global_step)
        if self.wandb_run is not None:
            self.wandb_run.log(scalars, step=global_step)

    def log_histograms(self, hists, global_step: Optional[int] = None):
        """Per-layer parameter/gradient histograms — wandb.watch(log="all")
        parity (reference tools/train_net.py:768). ``hists`` maps layer name
        to {"counts": (64,), "lo": scalar, "hi": scalar} summarised in-graph
        by engine/steps.py watch_summary."""
        if self.wandb_run is None:
            return
        import numpy as np

        try:
            import wandb

            payload = {}
            for name, h in hists.items():
                counts = np.asarray(h["counts"], np.int64)
                lo, hi = float(h["lo"]), float(h["hi"])
                edges = np.linspace(lo, max(hi, lo + 1e-12), counts.size + 1)
                payload[name] = wandb.Histogram(np_histogram=(counts, edges))
            self.wandb_run.log(payload, step=global_step)
        except Exception as e:
            logger.warning("wandb histogram log failed: %s", e)

    def alert(self, title: str, text: str):
        """wandb.alert parity (utils/loss.py:114-128) — warning-level."""
        if self.wandb_run is not None:
            try:
                import wandb

                self.wandb_run.alert(
                    title=title, text=text, level=wandb.AlertLevel.WARN
                )
            except Exception as e:
                logger.warning("wandb alert failed: %s", e)
        logger.warning("%s: %s", title, text)

    def close(self):
        if self.tb is not None:
            self.tb.close()
        if self.wandb_run is not None:
            self.wandb_run.finish()


def _cfg_to_dict(node):
    out = {}
    for k, v in node.items():
        out[k] = _cfg_to_dict(v) if hasattr(v, "items") else v
    return out
