"""Process-level JAX setup: persistent compilation cache.

Full-model train steps take minutes to compile (AOT through a relay in this
environment); the persistent cache makes re-runs of the same program —
auto-resume, repeated benchmarks, test-after-train — near-instant. Applied
by the CLIs and bench entry points before the first compile.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/asf_tpu_jax")


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
