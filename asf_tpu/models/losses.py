"""Loss functions.

Parity targets:
  * ``get_loss_func`` registry (/root/reference/audio_slowfast/models/losses.py:9-26)
  * ``MaskedLoss`` = 0.5*(BCE(|preds|, |labels|) + MSE on ±1 positions),
    ignoring −10-masked entries (/root/reference/audio_slowfast/utils/loss.py:8-129;
    the wandb alert/table logging there is observability, handled by the engine)
  * verb/noun CE mean and dense state CE
    (/root/reference/audio_slowfast/tools/train_utils.py:76-152)

All losses are pure jittable functions: ``fn(logits_or_preds, labels) -> scalar``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax CE with integer labels (torch nn.CrossEntropyLoss parity)."""
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    ).mean()


def bce(preds: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """torch nn.BCELoss (inputs are probabilities)."""
    p = jnp.clip(preds.astype(jnp.float32), 1e-12, 1.0 - 1e-7)
    return -(labels * jnp.log(p) + (1.0 - labels) * jnp.log1p(-p)).mean()


def bce_logit(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return optax.sigmoid_binary_cross_entropy(logits.astype(jnp.float32), labels).mean()


def mse(preds: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.square(preds.astype(jnp.float32) - labels).mean()


def masked_loss(preds: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """MaskedLoss parity (utils/loss.py:8-58): labels in {-1,0,1} with -10
    marking padded entries.

    0.5 * ( BCE(|p|, |y|) over unmasked entries
          + MSE(p, y) over entries where |y| == 1 )
    """
    preds = preds.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    keep = labels != -10.0

    abs_p = jnp.clip(jnp.abs(preds), 1e-12, 1.0 - 1e-7)
    abs_y = jnp.abs(labels)
    bce_el = -(abs_y * jnp.log(abs_p) + (1.0 - abs_y) * jnp.log1p(-abs_p))
    bce_term = jnp.sum(jnp.where(keep, bce_el, 0.0)) / jnp.maximum(keep.sum(), 1)

    pos = (abs_y == 1.0) & keep
    mse_el = jnp.square(preds - labels)
    mse_term = jnp.sum(jnp.where(pos, mse_el, 0.0)) / jnp.maximum(pos.sum(), 1)

    return 0.5 * (bce_term + mse_term)


def state_cross_entropy(preds: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Dense per-window state CE (train_utils.py:134-152).

    preds: (B, N, P, 3) logits; labels: (B, N, P, 3) one-hot, padded windows
    filled with -1. CE over the class axis; entries kept where the label
    vector has no -1.
    """
    preds = preds.astype(jnp.float32)
    keep = jnp.all(labels != -1.0, axis=-1)  # (B, N, P)
    logp = jax.nn.log_softmax(preds, axis=-1)
    ce = -(labels * logp).sum(axis=-1)  # (B, N, P)
    return jnp.sum(jnp.where(keep, ce, 0.0)) / jnp.maximum(keep.sum(), 1)


_LOSSES = {
    "cross_entropy": cross_entropy,
    "bce": bce,
    "bce_logit": bce_logit,
    "mse": mse,
    "masked_loss": masked_loss,
}


def get_loss_func(loss_name: str):
    if loss_name not in _LOSSES:
        raise NotImplementedError(f"Loss {loss_name} is not supported")
    return _LOSSES[loss_name]
