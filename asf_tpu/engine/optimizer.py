"""Optimizer construction (optax) with torch semantics.

Parity with /root/reference/audio_slowfast/models/optimizer.py:11-93:
  * SGD: coupled weight decay added to the gradient BEFORE momentum,
    buf = m*buf + (1-dampening)*g, nesterov d = g + m*buf, p -= lr*d
  * Adam: torch defaults (betas 0.9/0.999, eps 1e-8, coupled weight decay)
  * BN/non-BN parameter split with separate weight decays
    (BN.WEIGHT_DECAY vs SOLVER.WEIGHT_DECAY; optimizer.py:26-52)
  * BN.FREEZE: BN parameters (except the s1 stems and s1_fuse) receive zero
    updates (freeze_fn("bn_parameters"), audio_model_builder.py:327-336,
    invoked from tools/train_net.py:709-710)

The per-iteration LR (utils/lr_policy.py) enters the jitted step as a scalar
via ``optax.inject_hyperparams`` — no per-step recompiles, no param-group
bookkeeping.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    return ".".join(str(getattr(k, "key", k)) for k in path)


def is_bn_param(path) -> bool:
    """Reference rule: any parameter whose dotted name contains 'bn'
    (models/optimizer.py:32)."""
    return "bn" in _path_str(path)


def is_frozen_bn_param(path) -> bool:
    """freeze_fn('bn_parameters') exempts s1.pathway{0,1}_stem.bn and
    s1_fuse.bn (audio_model_builder.py:330-336)."""
    p = _path_str(path)
    if "bn" not in p:
        return False
    exempt = ("s1.pathway0_stem.bn" in p) or ("s1.pathway1_stem.bn" in p) or ("s1_fuse.bn" in p)
    return not exempt


def _sgd_with_dampening(momentum: float, dampening: float, nesterov: bool):
    """torch.optim.SGD momentum transform (dampening-aware)."""

    def init(params):
        return optax.TraceState(trace=jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params

        def upd(g, t):
            return momentum * t + (1.0 - dampening) * g

        new_trace = jax.tree.map(upd, updates, state.trace)
        if nesterov:
            out = jax.tree.map(lambda g, t: g + momentum * t, updates, new_trace)
        else:
            out = new_trace
        return out, optax.TraceState(trace=new_trace)

    return optax.GradientTransformation(init, update)


def construct_optimizer(cfg, params: Dict[str, Any]) -> optax.GradientTransformation:
    """Build the optax chain for ``params`` (a params pytree for masking)."""
    bn_mask = jax.tree_util.tree_map_with_path(lambda p, _: is_bn_param(p), params)
    non_bn_mask = jax.tree.map(lambda b: not b, bn_mask)

    wd_parts = []
    if cfg.SOLVER.WEIGHT_DECAY:
        wd_parts.append(optax.masked(optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY), non_bn_mask))
    if cfg.BN.WEIGHT_DECAY:
        wd_parts.append(optax.masked(optax.add_decayed_weights(cfg.BN.WEIGHT_DECAY), bn_mask))

    method = cfg.SOLVER.OPTIMIZING_METHOD
    if method == "sgd":
        core = _sgd_with_dampening(
            cfg.SOLVER.MOMENTUM, cfg.SOLVER.DAMPENING, cfg.SOLVER.NESTEROV
        )
    elif method == "adam":
        core = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    else:
        raise NotImplementedError(f"Does not support {method} optimizer")

    def make_lr_chain(learning_rate):
        return optax.chain(*wd_parts, core, optax.scale(-1.0 * learning_rate))

    tx = optax.inject_hyperparams(make_lr_chain)(learning_rate=cfg.SOLVER.BASE_LR)

    if cfg.BN.FREEZE:
        # Zero the updates of frozen BN params (torch excludes them from the
        # optimizer entirely; net effect identical).
        frozen = jax.tree_util.tree_map_with_path(lambda p, _: is_frozen_bn_param(p), params)
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen))

    return tx


def set_lr(opt_state, new_lr):
    """Write the injected learning rate (parity with optim.set_lr,
    models/optimizer.py:85-93). Walks the (possibly chained/masked) state to
    the InjectHyperparamsState and updates its dict in place — works both
    eagerly and under trace (the dict holds the traced scalar)."""

    def walk(s):
        if hasattr(s, "hyperparams"):
            s.hyperparams["learning_rate"] = jnp.asarray(new_lr, jnp.float32)
            return True
        if hasattr(s, "inner_state") and walk(s.inner_state):
            return True
        if isinstance(s, (tuple, list)):
            return any(walk(x) for x in s)
        return False

    assert walk(opt_state), "no InjectHyperparamsState found in optimizer state"
    return opt_state


def get_lr(opt_state):
    def walk(s):
        if hasattr(s, "hyperparams"):
            return s.hyperparams["learning_rate"]
        if hasattr(s, "inner_state"):
            r = walk(s.inner_state)
            if r is not None:
                return r
        if isinstance(s, (tuple, list)):
            for x in s:
                r = walk(x)
                if r is not None:
                    return r
        return None

    return walk(opt_state)
