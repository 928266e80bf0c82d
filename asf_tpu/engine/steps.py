"""Jitted train/eval steps with the on-device input pipeline.

This is the TPU-native heart of the engine: one jitted function covers what
the reference splits across DataLoader workers (librosa DSP + SpecAugment),
H2D copies, forward, loss, backward, DDP all-reduce and optimizer step
(/root/reference/audio_slowfast/tools/train_net.py:365-656). Under jit with
the batch sharded over the mesh's ``data`` axis and params replicated, XLA
emits the gradient all-reduce over ICI automatically.

Loss composition parity:
  * verb+noun CE mean (tools/train_utils.py:76-101)
  * + dense state CE (compute_loss_with_state, train_utils.py:104-152),
    with state labels built exactly like prepare_state_labels
    (train_utils.py:41-73) but vectorised/jittable
  * single-task CE for VGG-Sound
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from asf_tpu.dsp.logmel import LogMelParams, log_mel_spectrogram
from asf_tpu.dsp.pathways import slow_indices
from asf_tpu.dsp.specaugment import spec_augment_batch
from asf_tpu.models import losses as losses_mod
from . import metrics as metrics_mod
from .optimizer import set_lr


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def is_gru_model(cfg) -> bool:
    return cfg.MODEL.MODEL_NAME == "AudioSlowFastGRU"


def is_multi_pathway(cfg) -> bool:
    return cfg.MODEL.ARCH in cfg.MODEL.MULTI_PATHWAY_ARCH


def has_state_head(cfg) -> bool:
    """State projections are selected purely by ONLY_ACTION_RECOGNITION
    (train_net.py:781-793); applies to both the GRU chain model and the
    single-clip AudioSlowFast (N=1 window)."""
    return is_multitask(cfg) and not cfg.MODEL.ONLY_ACTION_RECOGNITION


def is_multitask(cfg) -> bool:
    return len(cfg.MODEL.NUM_CLASSES) > 1


def lazy_optimizer(cfg):
    """Deferred construct_optimizer holder: init_state needs a tx, but the
    optimizer masks need the params template first — the holder builds the
    real optax tx on the first .init(params) call and keeps it on .tx.
    Shared by train(cfg) and test(cfg) (and the bench/warm-cache scripts)."""
    from .optimizer import construct_optimizer

    class _Lazy:
        tx = None

        def init(self, params):
            if self.tx is None:
                self.tx = construct_optimizer(cfg, params)
            return self.tx.init(params)

    return _Lazy()


def make_input_pipeline(cfg):
    """waveforms -> list of pathway tensors, entirely on device.

    Regular: (B, S) -> [(B, T/alpha, F, 1), (B, T, F, 1)] (or single pathway)
    GRU:     (B, N, S) -> [(B, N, T/alpha, F, 1), (B, N, T, F, 1)]
    """
    p = LogMelParams(cfg)
    multi = is_multi_pathway(cfg)
    alpha = cfg.SLOWFAST.ALPHA
    t_out = cfg.AUDIO_DATA.NUM_FRAMES
    augment = bool(getattr(cfg.TPU, "SPEC_AUGMENT", True))

    def pipeline(waveform, n_valid, rng: Optional[jax.Array] = None, train: bool = False):
        if waveform.dtype == jnp.int16:
            # int16 transfer path (TPU.INT16_TRANSFER): wavs are 16-bit PCM
            # on disk, so the loader ships raw samples at half the host-copy
            # and H2D bytes; this scale matches load_wav's host conversion
            # bit-for-bit (data/vggsound.py:26-28).
            waveform = waveform.astype(jnp.float32) / 32768.0
        gru = waveform.ndim == 3
        if gru:
            b, n, s = waveform.shape
            flat = waveform.reshape(b * n, s)
            nv = n_valid.reshape(b * n)
        else:
            flat = waveform
            nv = n_valid

        spec = log_mel_spectrogram(flat, p, n_valid_samples=nv, out_frames=t_out)

        if train and rng is not None and augment:
            spec = spec_augment_batch(rng, spec)

        if multi:
            idx = jnp.asarray(slow_indices(spec.shape[1], alpha))
            slow = jnp.take(spec, idx, axis=1)
            paths = [slow, spec]
        else:
            paths = [spec]

        out = []
        for x in paths:
            x = x[..., None]  # channel dim
            if gru:
                x = x.reshape(b, n, x.shape[1], x.shape[2], 1)
            out.append(x)
        return out

    return pipeline


def prepare_state_labels_jnp(precs, posts, lengths, n_windows: int):
    """Vectorised prepare_state_labels (train_utils.py:41-73).

    precs/posts: (B, P) in {-1, 0, 1}; returns (B, N, P, 3) one-hot with
    padded windows (n >= length) filled with -1.
    """
    b, p_dim = posts.shape
    n_idx = jnp.arange(n_windows)[None, :, None]  # (1, N, 1)
    half = (lengths // 2)[:, None, None]
    state = jnp.where(n_idx < half, precs[:, None, :], posts[:, None, :])  # (B, N, P)
    state = jax.nn.one_hot((state + 1).astype(jnp.int32), 3, dtype=jnp.float32)  # (B,N,P,3)
    padded = n_idx[..., None] >= lengths[:, None, None, None]
    return jnp.where(padded, -1.0, state)


def make_loss_fn(cfg):
    loss_fun = losses_mod.get_loss_func(cfg.MODEL.LOSS_FUNC)
    multitask = is_multitask(cfg)
    with_state = has_state_head(cfg)

    def compute(preds, labels, lengths=None):
        """Returns (total_loss, dict of components)."""
        if not multitask:
            key = "class_id" if "class_id" in labels else "verb"
            loss = loss_fun(preds, labels[key])
            return loss, {"loss": loss}
        if with_state:
            x_v, x_n, x_s = preds
            loss_verb = loss_fun(x_v, labels["verb"])
            loss_noun = loss_fun(x_n, labels["noun"])
            if x_s.ndim == 3:
                # single-clip state head: one window holding the
                # postcondition (prepare_state_labels at N=1)
                x_s = x_s[:, None]
            if lengths is None:
                lengths = jnp.ones((x_s.shape[0],), jnp.int32)
            state_labels = prepare_state_labels_jnp(
                labels["precs"], labels["posts"], lengths, x_s.shape[1]
            )
            loss_state = losses_mod.state_cross_entropy(x_s, state_labels)
            total = (loss_verb + loss_noun + loss_state) / 3.0
            return total, {
                "loss": total,
                "verb_loss": loss_verb,
                "noun_loss": loss_noun,
                "state_loss": loss_state,
            }
        x_v, x_n = preds[0], preds[1]
        loss_verb = loss_fun(x_v, labels["verb"])
        loss_noun = loss_fun(x_n, labels["noun"])
        total = (loss_verb + loss_noun) / 2.0
        return total, {"loss": total, "verb_loss": loss_verb, "noun_loss": loss_noun}

    return compute


def _apply_model(cfg, model, variables, paths, batch, train, rngs, mutable):
    kwargs = dict(train=train, bn_stats_frozen=bool(cfg.BN.FREEZE))
    if is_gru_model(cfg):
        return model.apply(
            variables,
            paths,
            batch["lengths"],
            batch.get("noun_embedding"),
            rngs=rngs,
            mutable=mutable,
            **kwargs,
        )
    return model.apply(variables, paths, rngs=rngs, mutable=mutable, **kwargs)


def make_device_metrics(cfg):
    """Per-batch train accuracies computed IN-GRAPH on the step's preds.

    The reference fetches predictions to the host and computes top-k there
    every iteration (tools/train_net.py:500-532); on TPU that blocks the
    dispatch pipeline (~50 ms round-trips vs a ~10 ms step). Keeping the
    reduction in the compiled step leaves only O(10) scalars on device,
    which the train loop materialises once per LOG_PERIOD.
    """
    multitask = is_multitask(cfg)
    with_state = has_state_head(cfg)

    def compute(preds, labels):
        if multitask:
            x_v, x_n = preds[0], preds[1]
            v1, v5 = metrics_mod.topk_accuracies(x_v, labels["verb"], (1, 5))
            n1, n5 = metrics_mod.topk_accuracies(x_n, labels["noun"], (1, 5))
            a1, a5 = metrics_mod.multitask_topk_accuracies(
                (x_v, x_n), (labels["verb"], labels["noun"]), (1, 5)
            )
            out = {
                "verb_top1": v1, "verb_top5": v5,
                "noun_top1": n1, "noun_top5": n5,
                "action_top1": a1, "action_top5": a5,
            }
            if with_state:
                # trigger operand for the "State looking strange" alert
                # (reference check_predictions, tools/train_utils.py:12-38)
                out["state_pred_max_abs"] = jnp.max(jnp.abs(preds[2]))
            return out
        key = "class_id" if "class_id" in labels else "verb"
        k1, k5 = metrics_mod.topk_accuracies(preds, labels[key], (1, 5))
        return {"top1_err": 100.0 - k1, "top5_err": 100.0 - k5}

    return compute


WATCH_BINS = 64


def _watch_hist(x):
    """64-bin histogram summary of one tensor: (counts, lo, hi), in-graph.

    The bin edges are linspace(lo, hi, 65) — reconstructed host-side by
    ScalarLogger.log_histograms into a ``wandb.Histogram(np_histogram=...)``.
    """
    x = x.astype(jnp.float32).ravel()
    lo, hi = jnp.min(x), jnp.max(x)
    span = jnp.maximum(hi - lo, 1e-12)
    idx = jnp.clip(((x - lo) / span * WATCH_BINS).astype(jnp.int32), 0, WATCH_BINS - 1)
    counts = jnp.zeros((WATCH_BINS,), jnp.int32).at[idx].add(1)
    return {"counts": counts, "lo": lo, "hi": hi}


def _watch_name(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", None)
        if key is None:
            key = getattr(p, "name", None)
        if key is None:
            key = getattr(p, "idx", None)
        parts.append(str(key))
    return "/".join(parts)


def watch_summary(params, grads):
    """Per-layer parameter + gradient histograms — wandb.watch(log="all")
    parity (reference tools/train_net.py:768) without shipping tensors to
    the host: each layer reduces to 64 counts + a range."""
    out = {}
    for label, tree in (("parameters", params), ("gradients", grads)):
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            out[f"{label}/{_watch_name(path)}"] = _watch_hist(leaf)
    return out


def _make_step_core(cfg, model, tx):
    """The un-jitted single train step; shared by the per-batch jit wrapper
    and the scanned multi-batch dispatch (``make_train_multi_step``)."""
    pipeline = make_input_pipeline(cfg)
    loss_fn_ = make_loss_fn(cfg)
    device_metrics = make_device_metrics(cfg)
    watch = bool(cfg.WANDB.ENABLE and getattr(cfg.TPU, "WATCH_HISTOGRAMS", True))
    watch_period = max(1, int(cfg.LOG_PERIOD))

    def train_step(state: TrainState, batch, lr, rng):
        rng_aug, rng_drop = jax.random.split(jax.random.fold_in(rng, state.step))
        paths = pipeline(batch["waveform"], batch["n_valid"], rng_aug, train=True)

        def loss_of(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, mutated = _apply_model(
                cfg,
                model,
                variables,
                paths,
                batch,
                train=True,
                rngs={"dropout": rng_drop},
                mutable=["batch_stats"],
            )
            total, parts = loss_fn_(out, batch["labels"], batch.get("lengths"))
            return total, (parts, mutated["batch_stats"], out)

        (loss, (parts, new_stats, preds)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(state.params)

        opt_state = set_lr(state.opt_state, lr)
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        # wandb.watch parity (reference train_net.py:768): global grad/param
        # L2 norms every step, plus per-layer 64-bin histograms every
        # LOG_PERIOD steps (lax.cond keeps the scatter-adds off the critical
        # path on non-logging steps; the zeros branch is free).
        parts = dict(parts)
        parts["grad_norm"] = optax.global_norm(grads)
        parts["param_norm"] = optax.global_norm(new_params)
        if watch:
            fresh = (state.step % watch_period) == 0

            def _summary():
                return watch_summary(new_params, grads)

            def _zeros():
                return jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype), jax.eval_shape(_summary)
                )

            hists = jax.lax.cond(fresh, _summary, _zeros)
            hists["_fresh"] = fresh.astype(jnp.int32)
            parts["watch"] = hists

        stats = device_metrics(preds, batch["labels"])

        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, parts, stats

    return train_step


def make_train_step(cfg, model, tx):
    return jax.jit(_make_step_core(cfg, model, tx), donate_argnums=(0,))


def make_train_multi_step(cfg, model, tx, store=None):
    """K train steps per host dispatch: ``lax.scan`` over a macro-batch whose
    leaves carry a leading (K, ...) axis, with a (K,) LR vector.

    Why: through the TPU dispatch relay, launching a jitted step with FRESH
    input buffers costs ~100 ms of host time (vs ~16 ms of device compute at
    batch 128), so a per-batch host loop caps the real train loop at ~2
    steps/s no matter how fast the step is. Scanning K micro-steps inside one
    jitted call amortises the dispatch to ~100/K ms. The reference has no
    counterpart (eager torch pays per-op dispatch regardless,
    tools/train_net.py:365-656); this is the standard JAX/TPU pattern of
    moving the inner loop into the compiled program.

    With ``store`` (a DeviceSegmentStore) the dispatch accepts FUSED offset
    macros: leaves carry ``wave_start`` (K, B[, Nb]) int32 instead of the
    waveform, and the caller passes the store's HBM-resident mega-buffer as
    the trailing ``mega`` operand. Each scan step then gathers its (B, S)
    waveform in-graph (device_store.gather_in_graph) — one relay dispatch
    per K steps, no standalone gather program, and no (K, B, S) assembled
    intermediate in HBM. Waveform macros still work through the same jit
    (``mega=None``), so the streaming path and the epoch-tail singles keep
    their programs.

    Per-micro-step rng streams stay distinct because the core folds the rng
    with ``state.step``, which increments inside the scan carry.
    Returns (new_state, parts, stats) with (K,)-leading metric leaves.
    """
    core = _make_step_core(cfg, model, tx)
    # Clip length for the fused gather: from the store when given, else the
    # cfg-derived value every dataset uses (clip_size - 1, data/vggsound.py:53
    # / data/epickitchens.py:79) — so a caller that attached a store but
    # built the step without it still traces correct shapes.
    clip_samples = (
        int(store.clip_samples)
        if store is not None
        else int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    )

    # Only the state is donated: input waveform/label buffers can never alias
    # the outputs (dtype/shape mismatch — XLA would warn and ignore), and NOT
    # donating them keeps uploaded macros legally reusable by callers; the
    # mega-buffer must survive the call (every later macro gathers from it).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state: TrainState, macro_batch, lr_vec, rng, mega=None):
        def body(st, xs):
            batch, lr = xs
            if "wave_start" in batch:  # fused offset macro (static key check)
                from asf_tpu.data.device_store import gather_in_graph

                batch = dict(batch)
                starts = batch.pop("wave_start")
                batch["waveform"] = gather_in_graph(
                    mega, starts, batch["n_valid"], clip_samples
                )
            st2, parts, stats = core(st, batch, lr, rng)
            return st2, (parts, stats)

        new_state, (parts, stats) = jax.lax.scan(
            body, state, (macro_batch, lr_vec)
        )
        return new_state, parts, stats

    return multi_step


def make_eval_step(cfg, model):
    pipeline = make_input_pipeline(cfg)

    @jax.jit
    def eval_step(state: TrainState, batch):
        paths = pipeline(batch["waveform"], batch["n_valid"], None, train=False)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = _apply_model(
            cfg, model, variables, paths, batch, train=False, rngs=None, mutable=False
        )
        return out

    return eval_step


def _make_eval_metrics_core(cfg, model):
    """Eval forward + in-graph MASKED top-k accuracies in one traced body.

    The legacy eval loop ran the forward in jit but computed accuracies with
    eager jnp ops on host-sliced preds — every eager op is a dispatch
    round-trip through the TPU relay, which dwarfs the 6 ms eval step. The
    mask marks real rows of host-padded batches (pad rows weigh 0)."""
    pipeline = make_input_pipeline(cfg)
    multitask = is_multitask(cfg)

    def core(state: TrainState, batch, mask):
        paths = pipeline(batch["waveform"], batch["n_valid"], None, train=False)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = _apply_model(
            cfg, model, variables, paths, batch, train=False, rngs=None, mutable=False
        )
        if multitask:
            x_v, x_n = out[0], out[1]
            verb, noun = batch["labels"]["verb"], batch["labels"]["noun"]
            if verb.ndim > 1:
                # sliding-window multi-label batches (EpicKitchensSlide):
                # per-batch top-k is undefined; the slide test meter computes
                # its weighted variant on the host from the raw scores
                acc = {}
            else:
                v1, v5 = metrics_mod.topk_accuracies_masked(x_v, verb, (1, 5), mask)
                n1, n5 = metrics_mod.topk_accuracies_masked(x_n, noun, (1, 5), mask)
                a1, a5 = metrics_mod.multitask_topk_accuracies_masked(
                    (x_v, x_n), (verb, noun), (1, 5), mask
                )
                acc = {
                    "verb_top1": v1, "verb_top5": v5,
                    "noun_top1": n1, "noun_top5": n5,
                    "action_top1": a1, "action_top5": a5,
                }
        else:
            key = "class_id" if "class_id" in batch["labels"] else "verb"
            labels = batch["labels"][key]
            if labels.ndim > 1:
                acc = {}
            else:
                k1, k5 = metrics_mod.topk_accuracies_masked(out, labels, (1, 5), mask)
                acc = {"top1": k1, "top5": k5}
        return out, acc

    return core


def make_eval_metrics_step(cfg, model):
    return jax.jit(_make_eval_metrics_core(cfg, model))


def make_eval_multi_step(cfg, model):
    """K eval batches per host dispatch (see make_train_multi_step for why):
    macro_batch leaves and masks carry a leading (K, ...) axis; returns
    (preds, acc) with (K, ...)-leading leaves."""
    core = _make_eval_metrics_core(cfg, model)

    @jax.jit
    def multi_eval(state: TrainState, macro_batch, masks):
        def body(carry, xs):
            batch, mask = xs
            out, acc = core(state, batch, mask)
            return carry, (out, acc)

        _, (outs, accs) = jax.lax.scan(body, None, (macro_batch, masks))
        return outs, accs

    return multi_eval


def init_state(cfg, model, tx, rng, example_batch) -> TrainState:
    """Initialise params/batch_stats from an example batch (shapes only)."""
    pipeline = make_input_pipeline(cfg)
    paths = pipeline(
        jnp.asarray(example_batch["waveform"]),
        jnp.asarray(example_batch["n_valid"]),
        None,
        train=False,
    )
    if is_gru_model(cfg):
        variables = model.init(
            rng,
            paths,
            jnp.asarray(example_batch["lengths"]),
            jnp.asarray(example_batch.get("noun_embedding")),
            train=False,
        )
    else:
        variables = model.init(rng, paths, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
