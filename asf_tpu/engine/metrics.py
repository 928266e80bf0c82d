"""Metric functions.

Parity with /root/reference/audio_slowfast/utils/metrics.py:
  * topks_correct / topk_accuracies (:11-50,175-186)
  * multitask variants — verb+noun joint "action" accuracy (:80-106,189-198)
  * sliding-window weighted + multi-label variants (:41-76,109-146)
  * state F1/precision/recall via sklearn (:209-295) — host-side
  * VGG-Sound mAP/AUC/d' (/root/reference/audio_slowfast/utils/vggsound_metrics.py:8-65)

The top-k functions are pure jnp and run inside the jitted eval step with
mesh-wide ``psum`` replacing the reference's NCCL ``all_reduce``
(tools/train_net.py:500-532).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _top_idx(preds, max_k):
    """(N, C) -> (N, max_k) indices of the top-k scores, jnp."""
    _, idx = jax.lax.top_k(preds, max_k)
    return idx


def topks_correct(preds: jnp.ndarray, labels: jnp.ndarray, ks: Sequence[int]):
    """Number of correct top-k predictions for each k. preds (N, C), labels (N,)."""
    max_k = max(ks)
    top = _top_idx(preds, max_k)  # (N, max_k)
    correct = top == labels[:, None]  # (N, max_k)
    return [correct[:, :k].any(axis=1).sum().astype(jnp.float32) for k in ks]


def topk_accuracies(preds, labels, ks=(1, 5)):
    n = preds.shape[0]
    return [c / n * 100.0 for c in topks_correct(preds, labels, ks)]


def multitask_topks_correct(preds, labels, ks=(1,)):
    """Joint correctness across tasks: a sample is correct at k iff EVERY
    task's label appears in that task's top-k (utils/metrics.py:80-106)."""
    max_k = int(max(ks))
    n = labels[0].shape[0]
    all_correct = jnp.zeros((max_k, n), jnp.int32)
    for output, label in zip(preds, labels):
        top = _top_idx(output, max_k).T  # (max_k, N)
        all_correct = all_correct + (top == label[None, :]).astype(jnp.int32)
    task_count = len(preds)
    return [
        (all_correct[:k].sum(axis=0) >= task_count).astype(jnp.float32).sum() for k in ks
    ]


def multitask_topk_accuracies(preds, labels, ks=(1, 5)):
    n = preds[0].shape[0]
    return [c / n * 100.0 for c in multitask_topks_correct(preds, labels, ks)]


def topk_accuracies_masked(preds, labels, ks, mask):
    """Top-k accuracies over rows with mask==1, jnp (in-graph).

    Used by the jitted eval step on host-padded batches (the pad rows carry
    mask 0), replacing the host-side ``[:n_real]`` slice + eager top-k of the
    per-batch eval loop — each eager jnp op is a dispatch round-trip."""
    max_k = max(ks)
    top = _top_idx(preds, max_k)
    correct = top == labels[:, None]
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(m.sum(), 1.0)
    return [
        (correct[:, :k].any(axis=1).astype(jnp.float32) * m).sum() / denom * 100.0
        for k in ks
    ]


def multitask_topk_accuracies_masked(preds, labels, ks, mask):
    """Joint verb+noun top-k accuracy over rows with mask==1, jnp."""
    max_k = int(max(ks))
    n = labels[0].shape[0]
    all_correct = jnp.zeros((max_k, n), jnp.int32)
    for output, label in zip(preds, labels):
        top = _top_idx(output, max_k).T
        all_correct = all_correct + (top == label[None, :]).astype(jnp.int32)
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(m.sum(), 1.0)
    task_count = len(preds)
    return [
        ((all_correct[:k].sum(axis=0) >= task_count).astype(jnp.float32) * m).sum()
        / denom
        * 100.0
        for k in ks
    ]


# ---------------------------------------------------------------------------
# Sliding-window (untrimmed video) variants — host-side numpy
# ---------------------------------------------------------------------------

def topks_correct_slide(preds, labels, ks, per_action_instance=True, weight=None):
    """Weighted / multi-label top-k (utils/metrics.py:41-76). numpy host-side.

    labels: (N,) when per_action_instance else (N, L) with up to L overlapping
    labels per window ("any overlapping action counts").
    """
    preds = np.asarray(preds)
    weight = (
        np.ones(preds.shape[0]) / preds.shape[0]
        if weight is None
        else np.asarray(weight, np.float64) / np.sum(weight)
    )
    max_k = max(ks)
    top = np.argsort(-preds, axis=1)[:, :max_k].T  # (max_k, N)
    if per_action_instance:
        correct = top == np.asarray(labels)[None, :]
    else:
        labels = np.asarray(labels)
        correct = np.zeros_like(top, dtype=bool)
        for col in range(labels.shape[1]):
            correct |= top == labels[:, col][None, :]
    return [float((weight * correct[:k, :]).sum()) for k in ks]


def topk_accuracies_slide(preds, labels, ks, per_action_instance=True, weight=None):
    return [x * 100.0 for x in topks_correct_slide(preds, labels, ks, per_action_instance, weight)]


def multitask_topks_correct_slide(preds, labels, ks=(1,), per_action_instance=True, weight=None):
    weight = (
        np.ones(np.asarray(preds[0]).shape[0])
        if weight is None
        else np.asarray(weight, np.float64)
    )
    weight = weight / weight.sum()
    max_k = int(max(ks))
    n = np.asarray(labels[0]).shape[0]
    all_correct = np.zeros((max_k, n), dtype=np.int32)
    for output, label in zip(preds, labels):
        top = np.argsort(-np.asarray(output), axis=1)[:, :max_k].T
        label = np.asarray(label)
        if per_action_instance:
            correct = top == label[None, :]
        else:
            correct = np.zeros_like(top, dtype=bool)
            for col in range(label.shape[1]):
                correct |= top == label[:, col][None, :]
        all_correct += correct.astype(np.int32)
    task_count = len(preds)
    return [
        float((weight * (all_correct[:k].sum(axis=0) >= task_count)).sum()) for k in ks
    ]


def multitask_topk_accuracies_slide(preds, labels, ks, per_action_instance=True, weight=None):
    return [
        x * 100.0
        for x in multitask_topks_correct_slide(preds, labels, ks, per_action_instance, weight)
    ]


# ---------------------------------------------------------------------------
# State metrics (sklearn, host-side) — utils/metrics.py:209-295
# ---------------------------------------------------------------------------

def state_metrics(preds, labels, lengths, split="Val"):
    from sklearn.metrics import f1_score, precision_score, recall_score

    preds = np.asarray(preds)
    labels = np.asarray(labels)
    if preds.ndim == 4:
        e = np.exp(preds - preds.max(axis=3, keepdims=True))
        probs = e / e.sum(axis=3, keepdims=True)
        preds_cls = probs.argmax(axis=3)  # (B, N, P)
        labels_cls = labels.argmax(axis=3)
    else:
        # Quirk-faithful: the reference averages LOGITS over the class axis
        # here instead of argmax-ing (utils/metrics.py:223 preds.mean(dim=2))
        # — nonsensical but kept for parity; the engine always passes 4-D.
        preds_cls = preds.mean(axis=2)
        labels_cls = labels.argmax(axis=2)

    names = [
        ("f1_macro", lambda y, p: f1_score(y, p, average="macro", zero_division=0)),
        ("f1_micro", lambda y, p: f1_score(y, p, average="micro", zero_division=0)),
        ("recall_macro", lambda y, p: recall_score(y, p, average="macro", zero_division=0)),
        ("recall_micro", lambda y, p: recall_score(y, p, average="micro", zero_division=0)),
        ("precision_macro", lambda y, p: precision_score(y, p, average="macro", zero_division=0)),
        ("precision_micro", lambda y, p: precision_score(y, p, average="micro", zero_division=0)),
        ("accuracy", lambda y, p: float(np.mean(y == p))),
    ]
    acc = {f"{n}_{kind}": [] for n, _ in names for kind in ("precs", "posts")}
    for i, length in enumerate(np.asarray(lengths)):
        pre_p, pre_y = preds_cls[i, 0, :], labels_cls[i, 0, :]
        post_p, post_y = preds_cls[i, length - 1, :], labels_cls[i, length - 1, :]
        for n, fn in names:
            acc[f"{n}_precs"].append(fn(pre_y, pre_p))
            acc[f"{n}_posts"].append(fn(post_y, post_p))
    return {f"{split}/state/{k}": float(np.mean(v)) for k, v in acc.items()}


# ---------------------------------------------------------------------------
# VGG-Sound metrics — utils/vggsound_metrics.py:8-65
# ---------------------------------------------------------------------------

def d_prime(auc: float) -> float:
    from scipy.stats import norm

    return (2.0 ** 0.5) * norm.ppf(auc)


def vggsound_stats(preds, labels):
    """mAP / AUC / d' with one-hot targets."""
    from sklearn.metrics import average_precision_score, roc_auc_score

    preds = np.asarray(preds)
    labels = np.asarray(labels)
    num_classes = preds.shape[1]
    one_hot = np.eye(num_classes)[labels]
    aps, aucs = [], []
    for k in range(num_classes):
        if one_hot[:, k].sum() == 0:
            continue
        aps.append(average_precision_score(one_hot[:, k], preds[:, k]))
        try:
            aucs.append(roc_auc_score(one_hot[:, k], preds[:, k]))
        except ValueError:
            pass
    m_auc = float(np.mean(aucs)) if aucs else 0.0
    return {
        "mAP": float(np.mean(aps)) if aps else 0.0,
        "AUC": m_auc,
        "d_prime": d_prime(m_auc) if 0.0 < m_auc < 1.0 else 0.0,
    }


def get_map(preds, labels):
    """Multi-label mAP (parity with utils/meters.py:1932-1956): drop classes
    with no positives, then macro-average per-class average precision."""
    from sklearn.metrics import average_precision_score

    preds = np.asarray(preds)
    labels = np.asarray(labels)
    keep = ~np.all(labels == 0, axis=0)
    preds, labels = preds[:, keep], labels[:, keep]
    try:
        aps = average_precision_score(labels, preds, average=None)
    except ValueError:
        return 0.0
    return float(np.mean(aps))
