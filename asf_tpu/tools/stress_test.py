"""TPU burn-in / stress test — counterpart of the reference's gpu.py.

Chained bf16 matmuls on every local device, reporting measured TFLOP/s per
device each interval (a sanity check that the chips are healthy and reach
their expected roofline before launching a long run).

Usage:
    python -m asf_tpu.tools.stress_test -n 8192 [--seconds 60]
"""

from __future__ import annotations

import argparse
import time

from asf_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def stress_test(n: int = 8192, seconds: float = 60.0, chain: int = 100):
    import jax
    import jax.numpy as jnp
    import numpy as np

    devices = jax.local_devices()
    logger.info("Running TPU stress test on %d device(s): %s", len(devices), devices)

    @jax.jit
    def burn(a, b):
        def body(x, _):
            return jnp.tanh(x @ b) * 1e-3 + a * 1e-6, None

        out, _ = jax.lax.scan(body, a, None, length=chain)
        return out, jnp.sum(out.astype(jnp.float32))

    rng = np.random.default_rng(0)
    mats = [
        (
            jax.device_put(jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16), d),
            jax.device_put(jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16), d),
        )
        for d in devices
    ]
    def step(pairs):
        """One chained burn per device; returns new pairs. The scalar sum is
        pulled to the host (float(...)) — the only reliable execution barrier
        through remote-execution relays, where block_until_ready can resolve
        before the work runs and identical dispatches may be cached."""
        out = []
        checks = []
        for a, b in pairs:
            a2, s = burn(a, b)
            out.append((a2, b))
            checks.append(s)
        for s in checks:
            float(s)
        return out

    mats = step(mats)  # warm-up / compile

    flops_per_call = 2.0 * n * n * n * chain
    rate = 0.0
    t_end = time.time() + seconds
    while time.time() < t_end:
        t0 = time.perf_counter()
        mats = step(mats)
        dt = time.perf_counter() - t0
        rate = flops_per_call / dt / 1e12
        logger.info(
            "sustained %.1f TFLOP/s per device (%d devices)", rate, len(devices)
        )
    return rate


if __name__ == "__main__":
    from asf_tpu.utils.logging import setup_logging

    setup_logging(None)
    parser = argparse.ArgumentParser()
    parser.add_argument("-n", type=int, default=8192, help="Matrix size")
    parser.add_argument("--seconds", type=float, default=60.0)
    args = parser.parse_args()
    stress_test(args.n, args.seconds)
