"""Relay-safe device timing (the CLAUDE.md "Benchmark timing" recipe).

Through the TPU dispatch relay, identical dispatches are content-cached and
``block_until_ready`` can resolve before execution, so naive host loops
report impossible speeds. The only trustworthy method on this stack:

  * run the measured fn inside a ``lax.scan`` chain whose carry depends on
    every iteration's output (nothing can be elided or deduplicated),
  * difference two chain lengths (subtracts dispatch/compile constants),
  * force a ``float(...)`` host read to bound the actual execution.

Shared by the bench scripts (scripts/bench_dsp_v2.py,
scripts/bench_dsp_tiles_v2.py, ...); bench.py and the train-step benches
keep specialised variants because their chains carry model/optimizer state.
"""

from __future__ import annotations

import time


def chain_timer(fn, x0, iters: int = 10, repeats: int = 3) -> float:
    """Seconds per ``fn(x)`` call, measured with a scan-chain difference.

    ``fn`` maps one array (or pytree carry ``x0``'s leading array) to any
    pytree of arrays; only timing is observed, outputs are reduced into an
    epsilon carry bump so every iteration stays data-dependent.
    """
    import jax
    import jax.numpy as jnp

    def chained(x, n):
        def body(c, _):
            y = fn(c)
            leaves = jax.tree.leaves(y)
            bump = sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)
            return c + 1e-24 * bump.astype(c.dtype), None

        out, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(out)

    short = jax.jit(lambda w: chained(w, iters))
    long = jax.jit(lambda w: chained(w, 3 * iters))
    float(short(x0))
    float(long(x0))

    def best(f):
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(f(x0))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(long) - best(short)) / (2 * iters)
