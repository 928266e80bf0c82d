"""Process-level JAX setup: persistent compilation cache.

Full-model train steps take minutes to compile (AOT through a relay in this
environment); the persistent cache makes re-runs of the same program —
auto-resume, repeated benchmarks, test-after-train — near-instant. Applied
by the CLIs and bench entry points before the first compile.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/asf_tpu_jax")


def apply_platform_env() -> None:
    """Honour ASF_PLATFORM / ASF_CPU_DEVICES before any backend init.

    Site plugins may rewrite JAX_PLATFORMS at interpreter startup, so a
    plain env var cannot reliably select the CPU backend for debugging;
    these are read here, ahead of the first device query. Used by
    tools/run_net.py and the scripts/ entry points.
    """
    platform = os.environ.get("ASF_PLATFORM")
    n_cpu = os.environ.get("ASF_CPU_DEVICES")
    if n_cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_cpu}"
            ).strip()
        platform = platform or "cpu"
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def enable_compilation_cache(path: str | None = None) -> None:
    # CPU-backend AOT cache entries embed machine features and XLA warns of
    # possible SIGILL when reloaded; the cache only pays off for the slow
    # TPU compiles anyway, so skip it when a CPU backend is forced.
    for var in ("ASF_PLATFORM", "JAX_PLATFORMS"):
        if "cpu" in os.environ.get(var, "").lower():
            return

    import jax

    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or _DEFAULT_DIR
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took noticeable time to build
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
