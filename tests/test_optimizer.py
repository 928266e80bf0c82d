"""Optimizer + LR-policy parity vs torch.optim.SGD and the reference formulas."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from asf_tpu.config import get_cfg
from asf_tpu.engine.optimizer import construct_optimizer, get_lr, set_lr
from asf_tpu.utils import lr_policy


def test_sgd_nesterov_weight_decay_matches_torch():
    torch.manual_seed(0)
    w = torch.randn(4, 3, requires_grad=True)   # "non-bn" param
    bnw = torch.randn(5, requires_grad=True)    # "bn" param

    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.NESTEROV = True
    cfg.SOLVER.WEIGHT_DECAY = 1e-2
    cfg.BN.WEIGHT_DECAY = 0.0
    cfg.SOLVER.BASE_LR = 0.1

    topt = torch.optim.SGD(
        [
            {"params": [bnw], "weight_decay": cfg.BN.WEIGHT_DECAY},
            {"params": [w], "weight_decay": cfg.SOLVER.WEIGHT_DECAY},
        ],
        lr=cfg.SOLVER.BASE_LR,
        momentum=0.9,
        nesterov=True,
        dampening=0.0,
    )

    params = {"layer": {"kernel": jnp.asarray(w.detach().numpy().copy())},
              "a_bn": {"scale": jnp.asarray(bnw.detach().numpy().copy())}}
    # .copy(): jax CPU zero-copies numpy buffers; torch mutates them in place
    tx = construct_optimizer(cfg, params)
    state = tx.init(params)

    for step in range(4):
        torch.manual_seed(step + 10)
        gw = torch.randn(4, 3)
        gbn = torch.randn(5)
        w.grad = gw.clone()
        bnw.grad = gbn.clone()
        lr = 0.1 * (0.5 ** step)  # vary LR per step like the engine does
        for g in topt.param_groups:
            g["lr"] = lr
        topt.step()

        grads = {"layer": {"kernel": jnp.asarray(gw.numpy())},
                 "a_bn": {"scale": jnp.asarray(gbn.numpy())}}
        state = set_lr(state, lr)
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(
        np.asarray(params["layer"]["kernel"]), w.detach().numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["a_bn"]["scale"]), bnw.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_bn_freeze_zeroes_updates():
    cfg = get_cfg()
    cfg.BN.FREEZE = True
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    params = {
        "s2": {"pathway0_res0": {"branch2": {"a_bn": {"scale": jnp.ones(3)}}}},
        "s1": {"pathway0_stem": {"bn": {"scale": jnp.ones(3)}}},
        "head": {"projection": {"kernel": jnp.ones((3, 3))}},
    }
    tx = construct_optimizer(cfg, params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.asarray(updates["s2"]["pathway0_res0"]["branch2"]["a_bn"]["scale"]) == 0)
    assert np.any(np.asarray(updates["s1"]["pathway0_stem"]["bn"]["scale"]) != 0)  # exempt
    assert np.any(np.asarray(updates["head"]["projection"]["kernel"]) != 0)


def test_lr_policies_reference_formulas():
    cfg = get_cfg()
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.COSINE_END_LR = 0.0
    cfg.SOLVER.MAX_EPOCH = 100
    assert abs(lr_policy.get_lr_at_epoch(cfg, 0) - 0.1) < 1e-9
    assert abs(lr_policy.get_lr_at_epoch(cfg, 50) - 0.05) < 1e-9
    assert abs(lr_policy.get_lr_at_epoch(cfg, 100) - 0.0) < 1e-9

    cfg2 = get_cfg()
    cfg2.SOLVER.LR_POLICY = "steps_with_relative_lrs"
    cfg2.SOLVER.BASE_LR = 0.01
    cfg2.SOLVER.STEPS = [0, 20, 25]
    cfg2.SOLVER.LRS = [1, 0.1, 0.01]
    cfg2.SOLVER.MAX_EPOCH = 30
    assert abs(lr_policy.get_lr_at_epoch(cfg2, 5) - 0.01) < 1e-12
    assert abs(lr_policy.get_lr_at_epoch(cfg2, 21) - 0.001) < 1e-12
    assert abs(lr_policy.get_lr_at_epoch(cfg2, 29) - 0.0001) < 1e-12

    # warmup
    cfg.SOLVER.WARMUP_EPOCHS = 10.0
    cfg.SOLVER.WARMUP_START_LR = 0.01
    lr0 = lr_policy.get_lr_at_epoch(cfg, 0.0)
    assert abs(lr0 - 0.01) < 1e-9
    lr_end = lr_policy.get_lr_at_epoch(cfg, 10.0)
    assert abs(lr_end - lr_policy.lr_func_cosine(cfg, 10.0)) < 1e-9


def test_get_lr_roundtrip():
    cfg = get_cfg()
    params = {"w": jnp.ones(3)}
    tx = construct_optimizer(cfg, params)
    state = tx.init(params)
    state = set_lr(state, 0.123)
    assert abs(float(get_lr(state)) - 0.123) < 1e-7
