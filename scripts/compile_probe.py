"""Isolate which part of the GRU train step blows up TPU AOT compile time.

Times jit-compile (lower+compile, no execution) of progressively larger
subgraphs at the tiny e2e geometry. Run on the real TPU.
"""

import sys
import time

sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp
import numpy as np

from fixtures import make_epic_fixture, tiny_cfg


def timed_compile(name, fn, *args):
    # time first dispatch (compile + one run); .lower().compile() hangs on
    # some remote-compile backends, so execute instead
    t0 = time.time()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} compile+run {time.time()-t0:7.1f}s", flush=True)


def main():
    root = "/tmp/compile_probe"
    make_epic_fixture(root, with_pddl=True)
    cfg = tiny_cfg(root, gru=True, pddl=True)
    cfg.TPU.DATA_PARALLEL = 1
    cfg.TPU.USE_PALLAS_DSP = True

    from asf_tpu.engine.steps import make_input_pipeline, make_loss_fn
    from asf_tpu.models import build_model
    from asf_tpu.models.gru import TorchGRU

    rng = np.random.default_rng(0)
    B, N = 4, 4
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    wave = jnp.asarray(rng.standard_normal((B, N, clip)).astype(np.float32) * 0.1)
    nv = jnp.full((B, N), clip, jnp.int32)
    lengths = jnp.full((B,), N, jnp.int32)
    emb = jnp.asarray(rng.standard_normal((B, 512)).astype(np.float32))

    pipe = make_input_pipeline(cfg)

    # 1) DSP pipeline alone (train mode incl. SpecAugment)
    key = jax.random.PRNGKey(0)
    timed_compile("pipeline eval", lambda w, n: pipe(w, n, None, train=False)[0], wave, nv)
    timed_compile(
        "pipeline train (SpecAugment)",
        lambda w, n, k: pipe(w, n, k, train=True)[0],
        wave, nv, key,
    )

    # 2) GRU module fwd
    gru = TorchGRU(hidden_size=64, num_layers=2, bidirectional=True)
    x = jnp.asarray(rng.standard_normal((B, N, 128)).astype(np.float32))
    h0 = jnp.asarray(rng.standard_normal((4, B, 64)).astype(np.float32))
    gvars = gru.init(key, x, lengths, h0)
    timed_compile("TorchGRU fwd", lambda v, x: gru.apply(v, x, lengths, h0), gvars, x)
    timed_compile(
        "TorchGRU fwd+bwd",
        lambda v, x: jax.grad(lambda vv: jnp.sum(gru.apply(vv, x, lengths, h0)[0]))(v),
        gvars, x,
    )

    # 3) full model fwd and fwd+bwd (no DSP)
    model = build_model(cfg)
    paths = pipe(wave, nv, None, train=False)
    variables = model.init(key, paths, lengths, emb, train=False)
    timed_compile(
        "model fwd eval",
        lambda v, p: model.apply(v, p, lengths, emb, train=False),
        variables, paths,
    )

    loss_fn = make_loss_fn(cfg)
    labels = {
        "verb": jnp.zeros((B,), jnp.int32),
        "noun": jnp.zeros((B,), jnp.int32),
        "precs": jnp.zeros((B, 5), jnp.float32),
        "posts": jnp.ones((B, 5), jnp.float32),
    }

    def train_loss(params, batch_stats, p):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, p, lengths, emb,
            train=True, rngs={"dropout": key}, mutable=["batch_stats"],
        )
        total, _ = loss_fn(out, labels, lengths)
        return total

    timed_compile(
        "model fwd+bwd (no DSP)",
        lambda pr, bs, p: jax.grad(train_loss)(pr, bs, p),
        variables["params"], variables["batch_stats"], paths,
    )

    def full(params, batch_stats, w, n, k):
        p = pipe(w, n, k, train=True)
        return jax.grad(train_loss)(params, batch_stats, p)

    timed_compile(
        "full train grad (DSP+model)",
        full, variables["params"], variables["batch_stats"], wave, nv, key,
    )


if __name__ == "__main__":
    main()
