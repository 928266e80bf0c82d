"""Second-stage dissection of the slow GRU/state train-step compile.

compile_probe.py showed: DSP fast, GRU-module fast, model fwd 15s,
model fwd+bwd 33 min. This isolates the backward: trunk-only, trunk+plain
loss, trunk+state loss, with/without the GRU head.
"""

import sys
import time

sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp
import numpy as np

from fixtures import make_epic_fixture, tiny_cfg


def timed(name, fn, *args):
    t0 = time.time()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} compile+run {time.time()-t0:7.1f}s", flush=True)


def main():
    root = "/tmp/compile_probe2"
    make_epic_fixture(root, with_pddl=True)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    B, N = 4, 4

    # ---- plain AudioSlowFast (B=16 to match the GRU's B*N) ----
    cfg = tiny_cfg(root, gru=False, pddl=False)
    from asf_tpu.models import build_model

    model = build_model(cfg)
    t, f = cfg.AUDIO_DATA.NUM_FRAMES, cfg.AUDIO_DATA.NUM_FREQUENCIES
    fast = jnp.asarray(rng.standard_normal((B * N, t, f, 1)).astype(np.float32))
    slow = fast[:, :: cfg.SLOWFAST.ALPHA]
    variables = model.init(key, [slow, fast], train=False)
    labels = jnp.zeros((B * N,), jnp.int32)

    def plain_loss(params, bs):
        out, _ = model.apply(
            {"params": params, "batch_stats": bs}, [slow, fast],
            train=True, rngs={"dropout": key}, mutable=["batch_stats"],
        )
        xv, xn = out
        return jnp.mean(
            -jax.nn.log_softmax(xv)[jnp.arange(B * N), labels]
        ) + jnp.mean(-jax.nn.log_softmax(xn)[jnp.arange(B * N), labels])

    timed("plain trunk fwd+bwd (B=16)",
          lambda p, b: jax.grad(plain_loss)(p, b),
          variables["params"], variables["batch_stats"])

    # ---- non-GRU state model (B=16) ----
    cfg_s = tiny_cfg(root, gru=False, pddl=True)
    model_s = build_model(cfg_s)
    vs = model_s.init(key, [slow, fast], train=False)
    from asf_tpu.engine.steps import make_loss_fn

    loss_s = make_loss_fn(cfg_s)
    lab_s = {
        "verb": labels, "noun": labels,
        "precs": jnp.zeros((B * N, 5), jnp.float32),
        "posts": jnp.ones((B * N, 5), jnp.float32),
    }

    def state_loss(params, bs):
        out, _ = model_s.apply(
            {"params": params, "batch_stats": bs}, [slow, fast],
            train=True, rngs={"dropout": key}, mutable=["batch_stats"],
        )
        total, _parts = loss_s(out, lab_s, None)
        return total

    timed("state trunk fwd+bwd (B=16)",
          lambda p, b: jax.grad(state_loss)(p, b),
          vs["params"], vs["batch_stats"])


if __name__ == "__main__":
    main()
