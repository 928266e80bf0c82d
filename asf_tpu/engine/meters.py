"""Meters: windowed scalars, epoch stats, multi-view test ensembling.

Compact re-expression of /root/reference/audio_slowfast/utils/meters.py
(1956 lines, 10 classes) with the same JSON stats schema
(keys: _type, epoch, iter, dt, dt_data, eta, loss, lr, top1_acc/top5_acc or
verb/noun/action variants — meters.py:329-344 etc.) and the same ensemble
semantics:
  * TestMeter / EPICTestMeter: clip scores scattered into per-audio slots
    ``vid_id = clip_id // num_clips``, ensembled by sum or max
    (meters.py:1654-1679, 98-114), finalised to top-1/5 (:1715-1753)
  * EPICTestMeterSlide: window-weighted, multi-label "any overlapping action
    counts" correctness (meters.py:1756-1928; utils/metrics.py:41-76)
Val meters own the best-epoch logic (meters.py:1306-1353).
"""

from __future__ import annotations

import datetime
import time
from collections import deque
from typing import Dict, Optional

import numpy as np

from asf_tpu.utils.logging import log_json_stats
from . import metrics


def mem_stats() -> Dict[str, str]:
    """Memory gauges merged into iter stats — parity with the reference's
    gpu_mem/RAM fields (utils/meters.py:329-344; misc.py:50-72), with HBM
    standing in for gpu_mem."""
    out: Dict[str, str] = {}
    try:
        from asf_tpu.utils.misc import cpu_mem_usage, tpu_mem_usage

        used, total = cpu_mem_usage()
        out["RAM"] = f"{used:.2f}/{total:.2f} GB"
        hbm = tpu_mem_usage()
        if hbm:
            first = next(iter(hbm.values()))
            out["hbm"] = f"{first['bytes_in_use_gb']:.2f}/{first['bytes_limit_gb']:.2f} GB"
    except Exception:
        pass
    return out


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self._start = time.perf_counter()
        self._paused: Optional[float] = None
        self._total = 0.0

    def pause(self):
        if self._paused is None:
            self._total += time.perf_counter() - self._start
            self._paused = time.perf_counter()

    def resume(self):
        self._start = time.perf_counter()
        self._paused = None

    def seconds(self) -> float:
        if self._paused is None:
            return self._total + (time.perf_counter() - self._start)
        return self._total


class ScalarMeter:
    """Windowed-median/global-average scalar (meters.py:21-66)."""

    def __init__(self, window_size: int):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def reset(self):
        self.deque.clear()
        self.total = 0.0
        self.count = 0

    def add_value(self, value: float):
        self.deque.append(value)
        self.count += 1
        self.total += value

    def get_win_median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    def get_win_avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    def get_global_avg(self) -> float:
        return self.total / max(self.count, 1)


def _eta(seconds_per_iter: float, iters_left: int) -> str:
    return str(datetime.timedelta(seconds=int(seconds_per_iter * max(iters_left, 0))))


class _BaseEpochMeter:
    def __init__(self, epoch_iters: int, cfg):
        self.cfg = cfg
        self.epoch_iters = epoch_iters
        self.max_epoch = cfg.SOLVER.MAX_EPOCH * epoch_iters
        self.iter_timer = Timer()
        self.data_timer = Timer()
        self.net_timer = Timer()

    def iter_tic(self):
        self.iter_timer.reset()
        self.data_timer.reset()

    def iter_toc(self):
        self.iter_timer.pause()

    def data_toc(self):
        self.data_timer.pause()
        self.net_timer.reset()


class TrainMeter(_BaseEpochMeter):
    """Single-task train meter (meters.py:184-372 analogue)."""

    def __init__(self, epoch_iters: int, cfg):
        super().__init__(epoch_iters, cfg)
        self.loss = ScalarMeter(cfg.LOG_PERIOD)
        self.loss_total = 0.0
        self.lr = 0.0
        self.mb_top1_err = ScalarMeter(cfg.LOG_PERIOD)
        self.mb_top5_err = ScalarMeter(cfg.LOG_PERIOD)
        self.num_top1_mis = 0
        self.num_top5_mis = 0
        self.num_samples = 0

    def reset(self):
        self.loss.reset()
        self.loss_total = 0.0
        self.mb_top1_err.reset()
        self.mb_top5_err.reset()
        self.num_top1_mis = self.num_top5_mis = self.num_samples = 0

    def update_stats(self, top1_err, top5_err, loss, lr, mb_size):
        self.loss.add_value(loss)
        self.lr = lr
        self.loss_total += loss * mb_size
        self.mb_top1_err.add_value(top1_err)
        self.mb_top5_err.add_value(top5_err)
        self.num_top1_mis += top1_err * mb_size
        self.num_top5_mis += top5_err * mb_size
        self.num_samples += mb_size

    def log_iter_stats(self, cur_epoch, cur_iter):
        if (cur_iter + 1) % self.cfg.LOG_PERIOD != 0:
            return
        stats = {
            "_type": "train_iter",
            "epoch": f"{cur_epoch + 1}/{self.cfg.SOLVER.MAX_EPOCH}",
            "iter": f"{cur_iter + 1}/{self.epoch_iters}",
            "dt": self.iter_timer.seconds(),
            "dt_data": self.data_timer.seconds(),
            "dt_net": self.net_timer.seconds(),
            "eta": _eta(
                self.iter_timer.seconds(),
                self.max_epoch - (cur_epoch * self.epoch_iters + cur_iter + 1),
            ),
            "top1_err": self.mb_top1_err.get_win_median(),
            "top5_err": self.mb_top5_err.get_win_median(),
            "loss": self.loss.get_win_median(),
            "lr": self.lr,
            **mem_stats(),
        }
        log_json_stats(stats)

    def log_epoch_stats(self, cur_epoch):
        stats = {
            "_type": "train_epoch",
            "epoch": f"{cur_epoch + 1}/{self.cfg.SOLVER.MAX_EPOCH}",
            "dt": self.iter_timer.seconds(),
            "top1_err": self.num_top1_mis / max(self.num_samples, 1),
            "top5_err": self.num_top5_mis / max(self.num_samples, 1),
            "loss": self.loss_total / max(self.num_samples, 1),
            "lr": self.lr,
        }
        log_json_stats(stats)


class ValMeter(_BaseEpochMeter):
    """Single-task val meter with best-epoch tracking."""

    def __init__(self, max_iter: int, cfg):
        super().__init__(max_iter, cfg)
        self.mb_top1_err = ScalarMeter(cfg.LOG_PERIOD)
        self.mb_top5_err = ScalarMeter(cfg.LOG_PERIOD)
        self.num_top1_mis = 0
        self.num_top5_mis = 0
        self.num_samples = 0
        self.min_top1_err = 100.0

    def reset(self):
        self.mb_top1_err.reset()
        self.mb_top5_err.reset()
        self.num_top1_mis = self.num_top5_mis = self.num_samples = 0

    def update_stats(self, top1_err, top5_err, mb_size):
        self.mb_top1_err.add_value(top1_err)
        self.mb_top5_err.add_value(top5_err)
        self.num_top1_mis += top1_err * mb_size
        self.num_top5_mis += top5_err * mb_size
        self.num_samples += mb_size

    def log_iter_stats(self, cur_epoch, cur_iter):
        if (cur_iter + 1) % self.cfg.LOG_PERIOD != 0:
            return
        log_json_stats(
            {
                "_type": "val_iter",
                "epoch": f"{cur_epoch + 1}/{self.cfg.SOLVER.MAX_EPOCH}",
                "iter": f"{cur_iter + 1}/{self.epoch_iters}",
                "top1_err": self.mb_top1_err.get_win_median(),
                "top5_err": self.mb_top5_err.get_win_median(),
            }
        )

    def log_epoch_stats(self, cur_epoch):
        top1 = self.num_top1_mis / max(self.num_samples, 1)
        top5 = self.num_top5_mis / max(self.num_samples, 1)
        is_best = top1 < self.min_top1_err
        self.min_top1_err = min(self.min_top1_err, top1)
        log_json_stats(
            {
                "_type": "val_epoch",
                "epoch": f"{cur_epoch + 1}/{self.cfg.SOLVER.MAX_EPOCH}",
                "top1_err": top1,
                "top5_err": top5,
                "min_top1_err": self.min_top1_err,
            }
        )
        return is_best, {"top1_acc": 100.0 - top1}


class EPICTrainMeter(_BaseEpochMeter):
    """Verb/noun/action train meter (meters.py:375-733 analogue); optionally
    tracks the state loss (WithState variant)."""

    def __init__(self, epoch_iters: int, cfg, with_state: bool = False):
        super().__init__(epoch_iters, cfg)
        self.with_state = with_state
        self.lr = 0.0
        names = ["loss", "verb_loss", "noun_loss"] + (["state_loss"] if with_state else [])
        self.losses = {n: ScalarMeter(cfg.LOG_PERIOD) for n in names}
        self.loss_totals = {n: 0.0 for n in names}
        self.accs = {
            k: ScalarMeter(cfg.LOG_PERIOD)
            for k in ["verb_top1", "verb_top5", "noun_top1", "noun_top5", "action_top1", "action_top5"]
        }
        self.correct = {k: 0.0 for k in self.accs}
        self.num_samples = 0

    def reset(self):
        for m in self.losses.values():
            m.reset()
        for k in self.loss_totals:
            self.loss_totals[k] = 0.0
        for m in self.accs.values():
            m.reset()
        for k in self.correct:
            self.correct[k] = 0.0
        self.num_samples = 0

    def update_stats(self, top1_acc, top5_acc, losses: Dict[str, float], lr, mb_size):
        """top1_acc/top5_acc: (verb, noun, action) accuracy tuples."""
        self.lr = lr
        for i, name in enumerate(["verb", "noun", "action"]):
            self.accs[f"{name}_top1"].add_value(top1_acc[i])
            self.accs[f"{name}_top5"].add_value(top5_acc[i])
            self.correct[f"{name}_top1"] += top1_acc[i] * mb_size
            self.correct[f"{name}_top5"] += top5_acc[i] * mb_size
        for k, v in losses.items():
            if k in self.losses:
                self.losses[k].add_value(v)
                self.loss_totals[k] += v * mb_size
        self.num_samples += mb_size

    def log_iter_stats(self, cur_epoch, cur_iter):
        if (cur_iter + 1) % self.cfg.LOG_PERIOD != 0:
            return
        stats = {
            "_type": "train_iter",
            "epoch": f"{cur_epoch + 1}/{self.cfg.SOLVER.MAX_EPOCH}",
            "iter": f"{cur_iter + 1}/{self.epoch_iters}",
            "dt": self.iter_timer.seconds(),
            "dt_data": self.data_timer.seconds(),
            "dt_net": self.net_timer.seconds(),
            "eta": _eta(
                self.iter_timer.seconds(),
                self.max_epoch - (cur_epoch * self.epoch_iters + cur_iter + 1),
            ),
            "lr": self.lr,
        }
        for k, m in self.accs.items():
            stats[f"{k}_acc"] = m.get_win_median()
        for k, m in self.losses.items():
            stats[k] = m.get_win_median()
        stats.update(mem_stats())
        log_json_stats(stats)

    def log_epoch_stats(self, cur_epoch):
        n = max(self.num_samples, 1)
        stats = {
            "_type": "train_epoch",
            "epoch": f"{cur_epoch + 1}/{self.cfg.SOLVER.MAX_EPOCH}",
            "lr": self.lr,
        }
        for k, v in self.correct.items():
            stats[f"{k}_acc"] = v / n
        for k, v in self.loss_totals.items():
            stats[k] = v / n
        log_json_stats(stats)


class EPICValMeter(_BaseEpochMeter):
    """Verb/noun/action val meter with best-epoch logic (meters.py:1306-1353)."""

    def __init__(self, max_iter: int, cfg, with_state: bool = False):
        super().__init__(max_iter, cfg)
        self.with_state = with_state
        self.accs = {
            k: ScalarMeter(cfg.LOG_PERIOD)
            for k in ["verb_top1", "verb_top5", "noun_top1", "noun_top5", "action_top1", "action_top5"]
        }
        self.correct = {k: 0.0 for k in self.accs}
        self.num_samples = 0
        self.max_top1_acc = {"verb": 0.0, "noun": 0.0, "action": 0.0}
        self.state_stats: Dict[str, list] = {}

    def reset(self):
        for m in self.accs.values():
            m.reset()
        for k in self.correct:
            self.correct[k] = 0.0
        self.num_samples = 0
        self.state_stats = {}

    def update_stats(self, top1_acc, top5_acc, mb_size):
        for i, name in enumerate(["verb", "noun", "action"]):
            self.accs[f"{name}_top1"].add_value(top1_acc[i])
            self.accs[f"{name}_top5"].add_value(top5_acc[i])
            self.correct[f"{name}_top1"] += top1_acc[i] * mb_size
            self.correct[f"{name}_top5"] += top5_acc[i] * mb_size
        self.num_samples += mb_size

    def update_state_metrics(self, metrics_dict: Dict[str, float]):
        for k, v in metrics_dict.items():
            self.state_stats.setdefault(k, []).append(v)

    def log_iter_stats(self, cur_epoch, cur_iter):
        if (cur_iter + 1) % self.cfg.LOG_PERIOD != 0:
            return
        stats = {
            "_type": "val_iter",
            "epoch": f"{cur_epoch + 1}/{self.cfg.SOLVER.MAX_EPOCH}",
            "iter": f"{cur_iter + 1}/{self.epoch_iters}",
        }
        for k, m in self.accs.items():
            stats[f"{k}_acc"] = m.get_win_median()
        log_json_stats(stats)

    def log_epoch_stats(self, cur_epoch):
        n = max(self.num_samples, 1)
        top1 = {name: self.correct[f"{name}_top1"] / n for name in ["verb", "noun", "action"]}
        top5 = {name: self.correct[f"{name}_top5"] / n for name in ["verb", "noun", "action"]}
        is_best = top1["action"] > self.max_top1_acc["action"]
        for name in self.max_top1_acc:
            self.max_top1_acc[name] = max(self.max_top1_acc[name], top1[name])
        stats = {
            "_type": "val_epoch",
            "epoch": f"{cur_epoch + 1}/{self.cfg.SOLVER.MAX_EPOCH}",
        }
        for name in ["verb", "noun", "action"]:
            stats[f"{name}_top1_acc"] = top1[name]
            stats[f"{name}_top5_acc"] = top5[name]
            stats[f"max_{name}_top1_acc"] = self.max_top1_acc[name]
        for k, v in self.state_stats.items():
            stats[k] = float(np.mean(v))
        log_json_stats(stats)
        return is_best, {f"{k}_top1_acc": v for k, v in top1.items()}


class TestMeter:
    """Single-task multi-view ensemble (meters.py:98-181 analogue)."""

    def __init__(self, num_audios, num_clips, num_cls, overall_iters, ensemble_method="sum"):
        self.num_clips = num_clips
        self.overall_iters = overall_iters
        self.ensemble_method = ensemble_method
        self.audio_preds = np.zeros((num_audios, num_cls), np.float64)
        self.audio_labels = np.zeros((num_audios,), np.int64)
        self.clip_count = np.zeros((num_audios,), np.int64)
        self.iter_timer = Timer()
        self.stats = {}

    def reset(self):
        self.audio_preds[:] = 0
        self.audio_labels[:] = 0
        self.clip_count[:] = 0

    def update_stats(self, preds, labels, clip_ids):
        preds = np.asarray(preds)
        labels = np.asarray(labels)
        clip_ids = np.asarray(clip_ids)
        for i in range(preds.shape[0]):
            vid_id = int(clip_ids[i]) // self.num_clips
            if self.clip_count[vid_id] > 0:
                assert self.audio_labels[vid_id] == labels[i]
            self.audio_labels[vid_id] = labels[i]
            if self.ensemble_method == "sum":
                self.audio_preds[vid_id] += preds[i]
            elif self.ensemble_method == "max":
                self.audio_preds[vid_id] = np.maximum(self.audio_preds[vid_id], preds[i])
            else:
                raise NotImplementedError(self.ensemble_method)
            self.clip_count[vid_id] += 1

    def log_iter_stats(self, cur_iter):
        if (cur_iter + 1) % 20 != 0:
            return
        log_json_stats(
            {"_type": "test_iter", "cur_iter": f"{cur_iter + 1}", "time_diff": self.iter_timer.seconds()}
        )

    def iter_tic(self):
        self.iter_timer.reset()

    def iter_toc(self):
        self.iter_timer.pause()

    def data_toc(self):
        pass

    def finalize_metrics(self, ks=(1, 5)):
        if not np.all(self.clip_count == self.num_clips):
            log_json_stats(
                {"_type": "test_warn", "msg": "clip count incomplete",
                 "incomplete": int((self.clip_count != self.num_clips).sum())}
            )
        import jax.numpy as jnp

        accs = metrics.topk_accuracies(
            jnp.asarray(self.audio_preds), jnp.asarray(self.audio_labels), ks
        )
        self.stats = {"_type": "test_final"}
        for k, acc in zip(ks, accs):
            self.stats[f"top{k}_acc"] = f"{float(acc):.2f}"
        log_json_stats(self.stats)
        return np.asarray(self.audio_preds), np.asarray(self.audio_labels)


class EPICTestMeter:
    """Verb/noun multi-view ensemble (meters.py:1577-1753 analogue)."""

    def __init__(self, num_audios, num_clips, num_cls, overall_iters, ensemble_method="sum"):
        self.num_clips = num_clips
        self.ensemble_method = ensemble_method
        self.verb_preds = np.zeros((num_audios, num_cls[0]), np.float64)
        self.noun_preds = np.zeros((num_audios, num_cls[1]), np.float64)
        self.verb_labels = np.zeros((num_audios,), np.int64)
        self.noun_labels = np.zeros((num_audios,), np.int64)
        self.metadata = np.empty(num_audios, dtype=object)
        self.clip_count = np.zeros((num_audios,), np.int64)
        self.iter_timer = Timer()
        self.stats = {}

    def reset(self):
        self.verb_preds[:] = 0
        self.noun_preds[:] = 0
        self.clip_count[:] = 0

    def update_stats(self, preds, labels, metadata, clip_ids):
        verb_p, noun_p = np.asarray(preds[0]), np.asarray(preds[1])
        verb_l, noun_l = np.asarray(labels[0]), np.asarray(labels[1])
        clip_ids = np.asarray(clip_ids)
        for i in range(verb_p.shape[0]):
            vid_id = int(clip_ids[i]) // self.num_clips
            if self.clip_count[vid_id] > 0:
                assert self.verb_labels[vid_id] == verb_l[i]
                assert self.noun_labels[vid_id] == noun_l[i]
            self.verb_labels[vid_id] = verb_l[i]
            self.noun_labels[vid_id] = noun_l[i]
            if self.ensemble_method == "sum":
                self.verb_preds[vid_id] += verb_p[i]
                self.noun_preds[vid_id] += noun_p[i]
            else:
                self.verb_preds[vid_id] = np.maximum(self.verb_preds[vid_id], verb_p[i])
                self.noun_preds[vid_id] = np.maximum(self.noun_preds[vid_id], noun_p[i])
            if metadata is not None and "narration_id" in metadata:
                self.metadata[vid_id] = metadata["narration_id"][i]
            self.clip_count[vid_id] += 1

    def iter_tic(self):
        self.iter_timer.reset()

    def iter_toc(self):
        self.iter_timer.pause()

    def data_toc(self):
        pass

    def log_iter_stats(self, cur_iter):
        if (cur_iter + 1) % 20 != 0:
            return
        log_json_stats({"_type": "test_iter", "cur_iter": f"{cur_iter + 1}"})

    def finalize_metrics(self, ks=(1, 5)):
        import jax.numpy as jnp

        verb = metrics.topk_accuracies(jnp.asarray(self.verb_preds), jnp.asarray(self.verb_labels), ks)
        noun = metrics.topk_accuracies(jnp.asarray(self.noun_preds), jnp.asarray(self.noun_labels), ks)
        action = metrics.multitask_topk_accuracies(
            (jnp.asarray(self.verb_preds), jnp.asarray(self.noun_preds)),
            (jnp.asarray(self.verb_labels), jnp.asarray(self.noun_labels)),
            ks,
        )
        self.stats = {"_type": "test_final"}
        for k, v, n, a in zip(ks, verb, noun, action):
            self.stats[f"verb_top{k}_acc"] = f"{float(v):.2f}"
            self.stats[f"noun_top{k}_acc"] = f"{float(n):.2f}"
            self.stats[f"action_top{k}_acc"] = f"{float(a):.2f}"
        log_json_stats(self.stats)
        return (
            (self.verb_preds, self.noun_preds),
            (self.verb_labels, self.noun_labels),
            self.metadata,
        )


class EPICTestMeterSlide:
    """Sliding-window test meter: per-window scores with multi-label
    correctness and window-count weighting (meters.py:1756-1928)."""

    def __init__(self, num_windows, num_cls, per_action_instance: bool,
                 window_weights: bool = False):
        self.per_action_instance = per_action_instance
        # Weight each scored slot by how many windows contributed to it —
        # the reference's dormant ``weight=`` variant of the slide metrics
        # (utils/metrics.py:41-76), exposed via TPU.SLIDE_WINDOW_WEIGHTS.
        self.window_weights = window_weights
        self.verb_preds = np.zeros((num_windows, num_cls[0]), np.float64)
        self.noun_preds = np.zeros((num_windows, num_cls[1]), np.float64)
        label_w = 1 if per_action_instance else 4
        self.verb_labels = np.full((num_windows, label_w), -1, np.int64)
        self.noun_labels = np.full((num_windows, label_w), -1, np.int64)
        self.window_count = np.zeros((num_windows,), np.int64)
        # Per-window narration ids for the score pickle
        # (reference meters.py:1846-1848,1921-1928).
        self.metadata = np.empty(num_windows, dtype=object)
        self.seen = np.zeros((num_windows,), bool)
        self.iter_timer = Timer()
        self.stats = {}

    def iter_tic(self):
        self.iter_timer.reset()

    def iter_toc(self):
        self.iter_timer.pause()

    def data_toc(self):
        pass

    def log_iter_stats(self, cur_iter):
        if (cur_iter + 1) % 20 != 0:
            return
        log_json_stats({"_type": "test_iter", "cur_iter": f"{cur_iter + 1}"})

    def update_stats(self, preds, labels, metadata, clip_ids):
        verb_p, noun_p = np.asarray(preds[0]), np.asarray(preds[1])
        verb_l, noun_l = np.asarray(labels[0]), np.asarray(labels[1])
        if verb_l.ndim == 1:
            verb_l = verb_l[:, None]
            noun_l = noun_l[:, None]
        # Accumulate (don't overwrite): the reference's ensemble variant sums
        # scores into the window slot (meters.py:1846 '+='), which is what
        # makes window_count a meaningful weight when a window is scored by
        # multiple views; single-visit slots are unaffected (start at zero).
        for i, cid in enumerate(np.asarray(clip_ids)):
            self.verb_preds[cid] += verb_p[i]
            self.noun_preds[cid] += noun_p[i]
            self.verb_labels[cid, : verb_l.shape[1]] = verb_l[i]
            self.noun_labels[cid, : noun_l.shape[1]] = noun_l[i]
            if metadata is not None and "narration_id" in metadata:
                self.metadata[cid] = metadata["narration_id"][i]
            self.window_count[cid] += 1
            self.seen[cid] = True

    def finalize_metrics(self, ks=(1, 5)):
        # Keep only annotated windows (whole-video mode leaves gaps = -1).
        keep = self.seen & (self.verb_labels[:, 0] != -1)
        vp, np_ = self.verb_preds[keep], self.noun_preds[keep]
        vl, nl = self.verb_labels[keep], self.noun_labels[keep]
        if self.per_action_instance:
            vl, nl = vl[:, 0], nl[:, 0]
        weight = self.window_count[keep].astype(np.float64) if self.window_weights else None
        verb = metrics.topk_accuracies_slide(vp, vl, ks, self.per_action_instance, weight)
        noun = metrics.topk_accuracies_slide(np_, nl, ks, self.per_action_instance, weight)
        action = metrics.multitask_topk_accuracies_slide(
            (vp, np_), (vl, nl), ks, self.per_action_instance, weight
        )
        self.stats = {"_type": "test_final", "num_windows_eval": int(keep.sum())}
        for k, v, n, a in zip(ks, verb, noun, action):
            self.stats[f"verb_top{k}_acc"] = f"{float(v):.2f}"
            self.stats[f"noun_top{k}_acc"] = f"{float(n):.2f}"
            self.stats[f"action_top{k}_acc"] = f"{float(a):.2f}"
        log_json_stats(self.stats)
        return ((vp, np_), (vl, nl), self.metadata[keep].copy())
