"""Dispatch-relay transfer/dispatch microbenchmarks (PROFILE.md §2 source).

Measures the properties that shape the loop engineering on this rig:
  * H2D wire rate with FRESH random payloads (device_put only STAGES — the
    wire is paid lazily at the first consuming dispatch, so each probe
    dispatches a trivial reduction and blocks on it)
  * the staging trap: device_put + block_until_ready resolves at GB/s
    without paying the wire
  * dispatch cost with resident vs fresh input buffers

Usage: python scripts/bench_wire.py
"""

import time

import numpy as np

from asf_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache

apply_platform_env()  # honour ASF_PLATFORM/ASF_CPU_DEVICES (axon rewrites JAX_PLATFORMS)
enable_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp

    consume = jax.jit(lambda x: jnp.sum(jnp.ravel(x)[:8].astype(jnp.float32)))
    full = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    rng = np.random.default_rng(0)

    def probe(shape, dtype, label, fresh=True):
        ts = []
        base = (rng.standard_normal(shape) * 100).astype(dtype)
        for i in range(4):
            a = (rng.standard_normal(shape) * 100).astype(dtype) if fresh else base
            t0 = time.perf_counter()
            d = jax.device_put(a)
            float(full(d))
            ts.append(time.perf_counter() - t0)
        best = min(ts[1:])
        print(
            f"{label}: {best*1e3:7.0f} ms -> {a.nbytes / best / 1e6:6.0f} MB/s"
            f"  ({'fresh' if fresh else 'repeated payload'})"
        )

    print("== H2D wire (device_put + consuming dispatch + block) ==")
    probe((128, 30695), np.float32, "15.7 MB f32 ")
    probe((128, 30695), np.int16, " 7.9 MB i16 ")
    probe((8, 128, 30695), np.int16, "62.9 MB i16 ")
    probe((128, 30695), np.float32, "15.7 MB f32 ", fresh=False)

    print("== staging only (device_put + block, NO consume — misleading) ==")
    a = (rng.standard_normal((8, 128, 30695)) * 100).astype(np.float32)
    t0 = time.perf_counter()
    d = jax.device_put(a)
    jax.block_until_ready(d)
    dt = time.perf_counter() - t0
    print(f"126 MB f32 stage: {dt*1e3:.0f} ms -> {a.nbytes/dt/1e6:.0f} MB/s apparent")

    print("== dispatch cost (tiny jitted fn) ==")
    f = jax.jit(lambda x, s: x * s)
    x_res = jax.device_put(np.ones((128, 256), np.float32))
    float(jnp.sum(f(x_res, jnp.float32(1.0))))  # compile
    t0 = time.perf_counter()
    for i in range(10):
        y = f(x_res, jnp.float32(1.0 + i * 1e-6))
    jax.block_until_ready(y)
    print(f"resident inputs: {(time.perf_counter()-t0)/10*1e3:.1f} ms/dispatch")
    t0 = time.perf_counter()
    for i in range(10):
        y = f(jax.device_put(np.full((128, 256), i, np.float32)), jnp.float32(1.0))
    jax.block_until_ready(y)
    print(f"fresh inputs   : {(time.perf_counter()-t0)/10*1e3:.1f} ms/dispatch")


if __name__ == "__main__":
    main()
