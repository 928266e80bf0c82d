"""Validation epoch.

Parity with eval_epoch / eval_epoch_with_state
(/root/reference/audio_slowfast/tools/eval_net.py:16-655): no-grad forward,
train-mirroring metrics, state F1/precision/recall, best-epoch decision from
the val meter.

Two dispatch modes:
  * fused (train(cfg) passes ``metrics_step``/``multi_metrics_step`` built by
    engine/steps.py): forward + masked top-k run inside ONE jit, and
    STEPS_PER_DISPATCH batches are scanned per host dispatch — through the
    TPU relay a dispatch with fresh input buffers costs ~100 ms of host time,
    an order of magnitude above the 6 ms eval step, so per-batch dispatch
    caps the real loop at ~1k clips/s regardless of device speed.
  * legacy per-batch (direct callers without the fused fns).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from asf_tpu.data.loader import batch_signature
from asf_tpu.parallel.mesh import pad_batch_to, put_with, shard_batch
from . import metrics
from .meters import EPICValMeter, ValMeter
from .steps import has_state_head, is_multitask, prepare_state_labels_jnp


def _stack_batches(grp):
    macro = {}
    for k in grp[0]:
        macro[k] = (
            {kk: np.stack([b[k][kk] for b in grp]) for kk in grp[0][k]}
            if isinstance(grp[0][k], dict)
            else np.stack([b[k] for b in grp])
        )
    return macro


class DeviceValCache:
    """Device-resident validation set (TPU.VAL_DEVICE_CACHE_MB).

    Val items are epoch-independent (the val loader is never reshuffled or
    epoch-re-keyed — train_loop.py only set_epochs the TRAIN loader), so the
    padded + uploaded dispatch inputs of eval epoch 1 are bit-identical to
    every later eval epoch's. On wire-constrained rigs (PROFILE.md §2:
    ~50 MB/s H2D) re-uploading them dominates eval; keeping them in HBM under
    a byte budget makes eval epochs >= 2 wire-free. Falls back to streaming
    (disabled) the moment the budget is exceeded."""

    def __init__(self, budget_bytes: int):
        self.budget = int(budget_bytes)
        self.items = []  # (kind, dev_batch, dev_mask, hkeep, nreals)
        self.ready = False
        self.disabled = self.budget <= 0
        self._bytes = 0

    def add(self, kind, dev_batch, dev_mask, hkeep, nreals):
        if self.disabled or self.ready:
            return
        nb = sum(
            int(getattr(x, "nbytes", 0)) for x in jax.tree.leaves(dev_batch)
        ) + int(getattr(dev_mask, "nbytes", 0))
        self._bytes += nb
        if self._bytes > self.budget:
            self.disabled = True
            self.items.clear()
            return
        self.items.append((kind, dev_batch, dev_mask, hkeep, list(nreals)))

    def finalize(self):
        if not self.disabled:
            self.ready = True


def eval_epoch(val_loader, state, eval_step, val_meter, cur_epoch, cfg, mesh=None,
               scalar_logger=None, metrics_step=None, multi_metrics_step=None,
               device_cache: DeviceValCache | None = None):
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
    log_period = max(1, cfg.LOG_PERIOD)

    def state_metrics_of(x_s, hbatch, n_real):
        x_s = np.asarray(x_s)[:n_real]
        if x_s.ndim == 3:  # single-clip state head -> N=1 window
            x_s = x_s[:, None]
        if "lengths" in hbatch:
            lengths = np.asarray(hbatch["lengths"])[:n_real]
        else:
            lengths = np.ones((x_s.shape[0],), np.int32)
        labels_state = np.asarray(
            prepare_state_labels_jnp(
                jnp.asarray(hbatch["labels"]["precs"][:n_real]),
                jnp.asarray(hbatch["labels"]["posts"][:n_real]),
                jnp.asarray(lengths),
                x_s.shape[1],
            )
        )
        return metrics.state_metrics(x_s, labels_state, lengths, split="Val")

    def collect_plot_rows(preds_h, hbatch, n_real):
        if multitask:
            all_preds.append(np.asarray(preds_h[0])[:n_real])  # verb scores
            all_labels.append(np.asarray(hbatch["labels"]["verb"])[:n_real])
        else:
            all_preds.append(np.asarray(preds_h)[:n_real])
            all_labels.append(np.asarray(hbatch["labels"]["class_id"])[:n_real])

    if metrics_step is not None:
        _eval_fused(
            val_loader, state, val_meter, cur_epoch, cfg, mesh,
            metrics_step, multi_metrics_step,
            multitask, with_state, collect_plots, batch_size, log_period,
            state_metrics_of, collect_plot_rows, device_cache,
        )
    else:
        _eval_legacy(
            val_loader, state, eval_step, val_meter, cur_epoch, cfg, mesh,
            multitask, with_state, collect_plots, batch_size, log_period,
            state_metrics_of, collect_plot_rows,
        )

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


def _eval_fused(
    val_loader, state, val_meter, cur_epoch, cfg, mesh,
    metrics_step, multi_metrics_step,
    multitask, with_state, collect_plots, batch_size, log_period,
    state_metrics_of, collect_plot_rows, device_cache=None,
):
    group = max(1, int(cfg.TPU.STEPS_PER_DISPATCH)) if multi_metrics_step else 1
    need_preds = with_state or collect_plots
    sharding = macro_sharding = None
    if mesh is not None:
        from asf_tpu.parallel.mesh import batch_sharding, macro_batch_sharding

        sharding = batch_sharding(mesh)
        macro_sharding = macro_batch_sharding(mesh)

    pending = []  # (iter0, accs_dev, outs_dev|None, [hbatch|None], [n_real])

    def flush():
        for it0, accs_d, outs_d, hbatches, n_reals in pending:
            k = len(n_reals)
            accs = jax.device_get(accs_d)
            outs = jax.device_get(outs_d) if outs_d is not None else None

            def pick(v, i):
                return float(v[i]) if k > 1 else float(v)

            def pick_preds(i):
                if outs is None:
                    return None
                if isinstance(outs, (tuple, list)):
                    return [o[i] if k > 1 else o for o in outs]
                return outs[i] if k > 1 else outs

            for i in range(k):
                cur_it, n_real = it0 + i, n_reals[i]
                acc = {key: pick(v, i) for key, v in accs.items()}
                if multitask:
                    val_meter.update_stats(
                        (acc["verb_top1"], acc["noun_top1"], acc["action_top1"]),
                        (acc["verb_top5"], acc["noun_top5"], acc["action_top5"]),
                        n_real,
                    )
                else:
                    val_meter.update_stats(
                        100.0 - acc["top1"], 100.0 - acc["top5"], n_real
                    )
                preds_h = pick_preds(i)
                if with_state:
                    val_meter.update_state_metrics(
                        state_metrics_of(preds_h[2], hbatches[i], n_real)
                    )
                if collect_plots:
                    collect_plot_rows(preds_h, hbatches[i], n_real)
                val_meter.log_iter_stats(cur_epoch, cur_it)
        pending.clear()

    cur_iter = 0

    def run(kind, dev_batch, dev_mask, hkeep, nreals):
        nonlocal cur_iter
        if kind == "macro":
            outs, accs = multi_metrics_step(state, dev_batch, dev_mask)
        else:
            outs, accs = metrics_step(state, dev_batch, dev_mask)
        pending.append(
            (cur_iter, accs, outs if need_preds else None, hkeep, list(nreals))
        )
        cur_iter += len(nreals)
        if len(pending) * group >= log_period:
            flush()

    if device_cache is not None and device_cache.ready:
        # Replay the device-resident val set: no loader pass, no collation,
        # no H2D wire — only the eval dispatches.
        val_meter.iter_tic()
        for kind, dev_b, dev_m, hkeep, nreals in device_cache.items:
            val_meter.data_toc()
            run(kind, dev_b, dev_m, hkeep, nreals)
            val_meter.iter_toc()
            val_meter.iter_tic()
        flush()
        return

    def slim(b):
        # state_metrics_of / collect_plot_rows only read labels + lengths;
        # dropping the waveform keeps DeviceValCache's retained host batches
        # (and the streaming path's transient `pending`) small — a cached
        # 50k-clip val set would otherwise pin GBs of host numpy for the
        # whole run on this 1-core host.
        return {k: b[k] for k in ("labels", "lengths") if k in b}

    def dispatch(batches, nreals):
        k = len(batches)
        hkeep = [slim(b) if need_preds else None for b in batches]
        if k > 1:
            macro = _stack_batches(batches)
            masks = np.zeros((k, batch_size), np.float32)
            for i, nr in enumerate(nreals):
                masks[i, :nr] = 1.0
            kind = "macro"
            dev_b = put_with(macro, macro_sharding)
            dev_m = put_with(masks, macro_sharding)
        else:
            mask = np.zeros((batch_size,), np.float32)
            mask[: nreals[0]] = 1.0
            kind = "single"
            dev_b = (
                shard_batch(batches[0], mesh)
                if mesh is not None
                else jax.tree.map(jnp.asarray, batches[0])
            )
            dev_m = put_with(mask, sharding)
        if device_cache is not None:
            device_cache.add(kind, dev_b, dev_m, hkeep, nreals)
        run(kind, dev_b, dev_m, hkeep, nreals)

    grp, grp_nreal = [], []
    sig = None
    val_meter.iter_tic()
    for batch in val_loader:
        batch, n_real = pad_batch_to(batch, batch_size)
        batch.pop("metadata", None)
        val_meter.data_toc()
        # GRU window-count bucketing yields batches with differing (B, Nb, S)
        # shapes; a macro group must be shape-uniform (np.stack + one compiled
        # scan). Dtype matters too: an int16-PCM batch next to a same-shape
        # float32 one (a probe-rescued file under TPU.INT16_TRANSFER) would
        # np.stack-promote the PCM to float32 WITHOUT the deferred /32768 —
        # ~32768x amplitude, silently. On a signature change, dispatch the
        # partial group as singles (same guard as perform_test /
        # DevicePrefetcher._shape_sig).
        bsig = batch_signature(batch)
        if grp and bsig != sig:
            for b, nr in zip(grp, grp_nreal):
                dispatch([b], [nr])
            grp, grp_nreal = [], []
        sig = bsig
        grp.append(batch)
        grp_nreal.append(n_real)
        if len(grp) == group:
            dispatch(grp, grp_nreal)
            grp, grp_nreal = [], []
        val_meter.iter_toc()
        val_meter.iter_tic()
    # tail shorter than the compiled scan length -> per-batch dispatches
    for tail_b, tail_n in zip(grp, grp_nreal):
        dispatch([tail_b], [tail_n])
    flush()
    if device_cache is not None:
        device_cache.finalize()


def _eval_legacy(
    val_loader, state, eval_step, val_meter, cur_epoch, cfg, mesh,
    multitask, with_state, collect_plots, batch_size, log_period,
    state_metrics_of, collect_plot_rows,
):
    # Accuracy scalars stay on device per iteration and are materialised in
    # LOG_PERIOD windows (each float() through the dispatch relay costs
    # ~50 ms, comparable to the eval step itself).
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
        batch.pop("metadata", None)
        # Keep the numpy batch: labels/state analyses read it host-side.
        # np.asarray on the SHARDED batch would fail for multi-host meshes
        # (non-addressable global arrays) and forces a device->host copy per
        # iteration otherwise.
        host_batch = batch
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        val_meter.data_toc()

        preds = eval_step(state, batch)

        if multitask:
            x_v = jnp.asarray(preds[0])[:n_real]
            x_n = jnp.asarray(preds[1])[:n_real]
            verb = host_batch["labels"]["verb"][:n_real]
            noun = host_batch["labels"]["noun"][:n_real]
            v1, v5 = metrics.topk_accuracies(x_v, verb, (1, 5))
            n1, n5 = metrics.topk_accuracies(x_n, noun, (1, 5))
            a1, a5 = metrics.multitask_topk_accuracies((x_v, x_n), (verb, noun), (1, 5))
            pending.append((cur_iter, (v1, v5, n1, n5, a1, a5), n_real))
            if with_state:
                val_meter.update_state_metrics(
                    state_metrics_of(preds[2], host_batch, n_real)
                )
        else:
            scores = jnp.asarray(preds)[:n_real]
            labels = host_batch["labels"]["class_id"][:n_real]
            k1, k5 = metrics.topk_accuracies(scores, labels, (1, 5))
            pending.append((cur_iter, (k1, k5), n_real))

        if collect_plots:
            collect_plot_rows(preds, host_batch, n_real)

        if (cur_iter + 1) % log_period == 0:
            flush()
        val_meter.iter_toc()
        val_meter.iter_tic()

    flush()


def build_val_meter(cfg, max_iter: int):
    # see build_train_meter: EPIC meters require multitask label tuples
    if cfg.TRAIN.DATASET.lower().startswith("epickitchens") and is_multitask(cfg):
        return EPICValMeter(max_iter, cfg, with_state=has_state_head(cfg))
    return ValMeter(max_iter, cfg)
