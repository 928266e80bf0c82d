"""Validation epoch.

Parity with eval_epoch / eval_epoch_with_state
(/root/reference/audio_slowfast/tools/eval_net.py:16-655): no-grad forward,
train-mirroring metrics, state F1/precision/recall, best-epoch decision from
the val meter.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from asf_tpu.parallel.mesh import pad_batch_to, shard_batch
from . import metrics
from .meters import EPICValMeter, ValMeter
from .steps import has_state_head, is_multitask, prepare_state_labels_jnp


def eval_epoch(val_loader, state, eval_step, val_meter, cur_epoch, cfg, mesh=None,
               scalar_logger=None):
    multitask = is_multitask(cfg)
    with_state = has_state_head(cfg)
    batch_size = val_loader.batch_size
    # Eval-time confusion-matrix / top-k histogram plots
    # (tensorboard_vis.plot_eval parity, visualization/tensorboard_vis.py:107-190)
    collect_plots = bool(
        cfg.TENSORBOARD.ENABLE
        and (cfg.TENSORBOARD.CONFUSION_MATRIX.ENABLE or cfg.TENSORBOARD.HISTOGRAM.ENABLE)
        and scalar_logger is not None
        and scalar_logger.tb is not None
    )
    all_preds, all_labels = [], []

    # Accuracy scalars stay on device per iteration and are materialised in
    # LOG_PERIOD windows, mirroring train_epoch (each float() through the
    # dispatch relay costs ~50 ms, comparable to the eval step itself).
    log_period = max(1, cfg.LOG_PERIOD)
    pending = []  # (cur_iter, device-scalar tuple, n_real)

    def flush():
        for it, acc_d, n_real_i in pending:
            acc = [float(v) for v in acc_d]
            if multitask:
                v1, v5, n1, n5, a1, a5 = acc
                val_meter.update_stats((v1, n1, a1), (v5, n5, a5), n_real_i)
            else:
                k1, k5 = acc
                val_meter.update_stats(100.0 - k1, 100.0 - k5, n_real_i)
            val_meter.log_iter_stats(cur_epoch, it)
        pending.clear()

    val_meter.iter_tic()
    for cur_iter, batch in enumerate(val_loader):
        batch, n_real = pad_batch_to(batch, batch_size)
        metadata = batch.pop("metadata", None)
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        val_meter.data_toc()

        preds = eval_step(state, batch)

        if multitask:
            x_v = jnp.asarray(preds[0])[:n_real]
            x_n = jnp.asarray(preds[1])[:n_real]
            verb = batch["labels"]["verb"][:n_real]
            noun = batch["labels"]["noun"][:n_real]
            v1, v5 = metrics.topk_accuracies(x_v, verb, (1, 5))
            n1, n5 = metrics.topk_accuracies(x_n, noun, (1, 5))
            a1, a5 = metrics.multitask_topk_accuracies((x_v, x_n), (verb, noun), (1, 5))
            pending.append((cur_iter, (v1, v5, n1, n5, a1, a5), n_real))
            if with_state:
                x_s = np.asarray(preds[2])[:n_real]
                if x_s.ndim == 3:  # single-clip state head -> N=1 window
                    x_s = x_s[:, None]
                if "lengths" in batch:
                    lengths = np.asarray(batch["lengths"])[:n_real]
                else:
                    lengths = np.ones((x_s.shape[0],), np.int32)
                labels_state = np.asarray(
                    prepare_state_labels_jnp(
                        jnp.asarray(batch["labels"]["precs"][:n_real]),
                        jnp.asarray(batch["labels"]["posts"][:n_real]),
                        jnp.asarray(lengths),
                        x_s.shape[1],
                    )
                )
                val_meter.update_state_metrics(
                    metrics.state_metrics(x_s, labels_state, lengths, split="Val")
                )
        else:
            scores = jnp.asarray(preds)[:n_real]
            labels = batch["labels"]["class_id"][:n_real]
            k1, k5 = metrics.topk_accuracies(scores, labels, (1, 5))
            pending.append((cur_iter, (k1, k5), n_real))

        if collect_plots:
            if multitask:
                all_preds.append(np.asarray(preds[0])[:n_real])  # verb scores
                all_labels.append(np.asarray(batch["labels"]["verb"][:n_real]))
            else:
                all_preds.append(np.asarray(preds)[:n_real])
                all_labels.append(np.asarray(batch["labels"]["class_id"][:n_real]))

        if (cur_iter + 1) % log_period == 0:
            flush()
        val_meter.iter_toc()
        val_meter.iter_tic()

    flush()
    if collect_plots and all_preds:
        preds_np = np.concatenate(all_preds)
        labels_np = np.concatenate(all_labels)
        n_cls = preds_np.shape[-1]
        names = None
        if cfg.TENSORBOARD.CLASS_NAMES_PATH:
            from asf_tpu.utils.misc import get_class_names

            names, _, _ = get_class_names(cfg.TENSORBOARD.CLASS_NAMES_PATH)
        if cfg.TENSORBOARD.CONFUSION_MATRIX.ENABLE:
            scalar_logger.tb.add_confusion_matrix(
                preds_np, labels_np, num_classes=n_cls,
                global_step=cur_epoch, class_names=names,
            )
        if cfg.TENSORBOARD.HISTOGRAM.ENABLE:
            scalar_logger.tb.add_topk_histograms(
                preds_np, labels_np,
                k=cfg.TENSORBOARD.HISTOGRAM.TOPK,
                global_step=cur_epoch, class_names=names,
            )

    is_best, top1 = val_meter.log_epoch_stats(cur_epoch)
    val_meter.reset()
    return is_best, top1


def build_val_meter(cfg, max_iter: int):
    if cfg.TRAIN.DATASET.lower().startswith("epickitchens"):
        return EPICValMeter(max_iter, cfg, with_state=has_state_head(cfg))
    return ValMeter(max_iter, cfg)
