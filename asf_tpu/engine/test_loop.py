"""Test driver: multi-view ensembling + sliding-window evaluation.

Parity with ``test(cfg)`` / ``perform_test`` / ``perform_test_slide``
(/root/reference/audio_slowfast/tools/test_net.py:31-544): build + load
checkpoint, meter selection by dataset/mode (:420-464), score accumulation,
finalisation, and pickling of
``{verb_output, noun_output, labels, narration_id}`` to
``OUTPUT_DIR/scores/...`` (:498-541). VGG-Sound additionally reports
mAP/AUC/d'.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np

from asf_tpu.checkpoint import manager as cu
from asf_tpu.data.device_store import resolve_offsets
from asf_tpu.data.loader import batch_signature, construct_loader
from asf_tpu.models import build_model
from asf_tpu.parallel.mesh import check_batch_divisibility, make_mesh, pad_batch_to, param_shardings, replicate_tree, shard_batch
from asf_tpu.utils.logging import get_logger, setup_logging
from . import metrics
from .meters import EPICTestMeter, EPICTestMeterSlide, TestMeter
from .steps import (
    TrainState,
    lazy_optimizer,
    init_state,
    is_multitask,
    make_eval_multi_step,
    make_eval_step,
)

logger = get_logger(__name__)


def perform_test(test_loader, state, eval_step, test_meter, cfg, mesh, multi_eval=None):
    """Score every test clip. With ``multi_eval`` (make_eval_multi_step),
    K same-shape batches are scanned per host dispatch and scores fetched per
    group — per-batch dispatch costs ~100 ms of host time through the TPU
    relay (PROFILE.md §2), an order of magnitude above the eval forward."""
    multitask = is_multitask(cfg)
    batch_size = test_loader.batch_size
    group = max(1, int(cfg.TPU.STEPS_PER_DISPATCH)) if multi_eval is not None else 1

    pending = []  # (iter0, outs_dev, [(n_real, metadata, labels, clip_ids)])

    def update_meter(cur_it, preds_h, n_real, metadata, labels, clip_ids):
        if multitask:
            x_v = np.asarray(preds_h[0])[:n_real]
            x_n = np.asarray(preds_h[1])[:n_real]
            test_meter.update_stats(
                (x_v, x_n),
                (labels["verb"][:n_real], labels["noun"][:n_real]),
                {k: v[:n_real] for k, v in metadata.items()} if metadata else None,
                clip_ids,
            )
        else:
            scores = np.asarray(preds_h)[:n_real]
            test_meter.update_stats(scores, labels["class_id"][:n_real], clip_ids)
        test_meter.iter_toc()
        test_meter.log_iter_stats(cur_it)
        test_meter.iter_tic()

    def flush():
        for it0, outs_d, metas in pending:
            outs = jax.device_get(outs_d)
            k = len(metas)

            def at(i):
                if isinstance(outs, (tuple, list)):
                    return [o[i] if k > 1 else o for o in outs]
                return outs[i] if k > 1 else outs

            for i, (n_real, metadata, labels, clip_ids) in enumerate(metas):
                update_meter(it0 + i, at(i), n_real, metadata, labels, clip_ids)
        pending.clear()

    cur_iter = 0

    store = getattr(test_loader, "device_store", None)

    def dispatch(grp):
        nonlocal cur_iter
        k = len(grp)
        metas = [
            (n_real, metadata, b["labels"], b["index"][:n_real])
            for b, n_real, metadata in grp
        ]
        if k > 1:
            from asf_tpu.parallel.mesh import macro_batch_sharding, put_with
            from .eval_loop import _stack_batches

            macro = _stack_batches([b for b, _, _ in grp])
            masks = np.zeros((k, batch_size), np.float32)
            for i, (_, nr, _) in enumerate(grp):
                masks[i, :nr] = 1.0
            ms = macro_batch_sharding(mesh)
            dev = resolve_offsets(
                macro, store, lambda b: put_with(b, ms), macro=True
            )
            outs, _ = multi_eval(state, dev, put_with(masks, ms))
        else:
            dev = resolve_offsets(
                grp[0][0], store, lambda b: shard_batch(b, mesh)
            )
            outs = eval_step(state, dev)
        pending.append((cur_iter, outs, metas))
        cur_iter += k
        if len(pending) >= 2:
            flush()

    grp = []
    sig = None
    test_meter.iter_tic()
    for batch in test_loader:
        batch, n_real = pad_batch_to(batch, batch_size)
        metadata = batch.pop("metadata", None)
        test_meter.data_toc()
        # shape AND dtype: a float32-rescued batch amid int16 ones must not
        # be stacked into one macro (see eval_loop's guard for the failure).
        bsig = batch_signature(batch)
        if grp and bsig != sig:
            for item in grp:
                dispatch([item])
            grp = []
        sig = bsig
        grp.append((batch, n_real, metadata))
        if len(grp) == group:
            dispatch(grp)
            grp = []
    for item in grp:  # tail
        dispatch([item])
    flush()

    return test_meter.finalize_metrics()


def _save_scores(cfg, results, multitask):
    import jax

    if jax.process_index() != 0:
        # Multi-host: every process holds identical results (each scores the
        # full test set), but concurrent pickle.dump to the shared
        # OUTPUT_DIR would interleave/truncate the file — only rank 0 writes
        # (reference: du.is_master_proc gating, tools/test_net.py).
        return
    scores_dir = os.path.join(cfg.OUTPUT_DIR, "scores")
    os.makedirs(scores_dir, exist_ok=True)
    name = cfg.TEST.SAVE_RESULTS_PATH or "test_scores.pkl"
    path = os.path.join(scores_dir, name)
    if multitask:
        (verb_p, noun_p), (verb_l, noun_l), metadata = results
        payload = {
            "verb_output": verb_p,
            "noun_output": noun_p,
            "labels": {"verb": verb_l, "noun": noun_l},
            "narration_id": metadata,
        }
    else:
        preds, labels = results
        payload = {"output": preds, "labels": labels}
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    logger.info("Saved test scores to %s", path)


def test(cfg):
    setup_logging(cfg.OUTPUT_DIR)
    np.random.seed(cfg.RNG_SEED)
    logger.info("Test with config:\n%s", cfg.dump())

    # Multi-host: every host scores the FULL test set on a host-local mesh
    # and writes identical results — the single-controller replacement for
    # the reference's per-iteration pred all_gather (tools/test_net.py:196-203),
    # whose pickled-gloo metadata gathers have no place under jit.
    multihost = jax.process_count() > 1
    mesh = make_mesh(cfg, local=multihost)
    check_batch_divisibility(cfg, mesh, int(cfg.TEST.BATCH_SIZE), "TEST")
    model = build_model(cfg)
    test_loader = construct_loader(cfg, "test")
    if multihost:
        test_loader.rank, test_loader.world_size = 0, 1

    example = next(iter(test_loader))
    example.pop("metadata", None)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)

    # HBM-resident test segments (attach AFTER the example batch — init_state
    # needs one real waveform batch): every ensemble view of a record gathers
    # from ONE stored segment, so the test H2D wire drops to the unique
    # segment bytes paid once at build (data/device_store.py).
    if int(getattr(cfg.TPU, "TEST_DEVICE_CACHE_MB", 0)) > 0:
        from asf_tpu.data.device_store import DeviceSegmentStore

        _store = DeviceSegmentStore.try_build(
            test_loader.dataset,
            int(cfg.TPU.TEST_DEVICE_CACHE_MB) << 20,
            mesh,
            quantum_bytes=int(getattr(cfg.TPU, "STORE_CAPACITY_QUANTUM_MB", 0)) << 20,
        )
        if _store is not None:
            test_loader.attach_store(_store)

    state = init_state(cfg, model, lazy_optimizer(cfg), rng, example)
    state = TrainState(
        params=param_shardings(state.params, mesh),
        batch_stats=replicate_tree(state.batch_stats, mesh),
        opt_state=state.opt_state,
        step=state.step,
    )
    state = cu.load_test_checkpoint(cfg, state)

    eval_step = make_eval_step(cfg, model)
    multi_eval = (
        make_eval_multi_step(cfg, model)
        if int(cfg.TPU.STEPS_PER_DISPATCH) > 1
        else None
    )

    multitask = is_multitask(cfg)
    dataset = test_loader.dataset
    num_items = len(dataset)

    if cfg.TEST.SLIDE.ENABLE or cfg.TEST.DATASET.lower().endswith("slide"):
        meter = EPICTestMeterSlide(
            num_windows=num_items,
            num_cls=cfg.MODEL.NUM_CLASSES,
            per_action_instance=cfg.TEST.SLIDE.PER_ACTION_INSTANCE,
            window_weights=bool(cfg.TPU.SLIDE_WINDOW_WEIGHTS),
        )
    elif multitask:
        num_clips = getattr(dataset, "_num_clips", cfg.TEST.NUM_ENSEMBLE_VIEWS)
        meter = EPICTestMeter(
            num_audios=num_items // num_clips,
            num_clips=num_clips,
            num_cls=cfg.MODEL.NUM_CLASSES,
            overall_iters=len(test_loader),
            ensemble_method=cfg.DATA.ENSEMBLE_METHOD,
        )
    else:
        num_clips = getattr(dataset, "_num_clips", cfg.TEST.NUM_ENSEMBLE_VIEWS)
        meter = TestMeter(
            num_audios=num_items // num_clips,
            num_clips=num_clips,
            num_cls=cfg.MODEL.NUM_CLASSES[0],
            overall_iters=len(test_loader),
            ensemble_method=cfg.DATA.ENSEMBLE_METHOD,
        )

    results = perform_test(
        test_loader, state, eval_step, meter, cfg, mesh, multi_eval=multi_eval
    )
    _save_scores(cfg, results, multitask)

    if not multitask and not cfg.DATA.MULTI_LABEL and cfg.TEST.DATASET.lower() == "vggsound":
        preds, labels = results
        logger.info("VGG-Sound stats: %s", metrics.vggsound_stats(preds, labels))

    return results
