"""Misc utilities: model info, memory gauges, class-name mapping.

Parity targets in /root/reference/audio_slowfast/utils/misc.py:
  * gpu/cpu memory gauges (:50-72) -> TPU HBM stats via device.memory_stats()
  * params/flops model info logging (:112-167) -> XLA cost analysis instead
    of fvcore flop_count (exact, compiler-reported)
  * get_class_names (:265-320) for TensorBoard confusion matrices
  * check_nan_losses (:23-30) lives in engine.train_loop
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

from asf_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def params_count(params) -> int:
    """Number of parameters in a Flax param tree (misc.py:33-40)."""
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def tpu_mem_usage() -> dict:
    """Per-device HBM stats in GB (replaces gpu_mem_usage, misc.py:50-57)."""
    import jax

    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use_gb": round(stats.get("bytes_in_use", 0) / 1024**3, 3),
                "bytes_limit_gb": round(stats.get("bytes_limit", 0) / 1024**3, 3),
            }
    return out


def cpu_mem_usage() -> tuple[float, float]:
    """(used_gb, total_gb) of host RAM (misc.py:60-72)."""
    try:
        import psutil

        vram = psutil.virtual_memory()
        return (vram.total - vram.available) / 1024**3, vram.total / 1024**3
    except ImportError:
        with open("/proc/meminfo") as f:
            info = {l.split(":")[0]: int(l.split()[1]) for l in f if ":" in l}
        total = info.get("MemTotal", 0) / 1024**2
        avail = info.get("MemAvailable", 0) / 1024**2
        return total - avail, total


def flops_of(jitted_fn, *args) -> Optional[float]:
    """Compiler-reported FLOPs of one call (replaces fvcore flop_count)."""
    try:
        compiled = jitted_fn.lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception as e:
        logger.warning("cost analysis unavailable: %s", e)
        return None


def log_model_info(model, params, batch_stats=None):
    """Params/buffers/memory summary (misc.py:154-170)."""
    logger.info("Model:\n%s", model)
    logger.info("Params: {:,}".format(params_count(params)))
    if batch_stats is not None:
        logger.info("BN buffers: {:,}".format(params_count(batch_stats)))
    mem = tpu_mem_usage()
    if mem:
        logger.info("HBM usage: %s", mem)


def get_class_names(path: str, parent_path: str = "", subset_path: str = ""):
    """(class_names, parent->child map, subset ids) from JSON files
    (misc.py:265-320; used by the TensorBoard confusion-matrix plots)."""
    with open(path) as f:
        class2idx = json.load(f)
    max_idx = max(class2idx.values())
    class_names = [None] * (max_idx + 1)
    for name, idx in class2idx.items():
        class_names[idx] = name

    class_parent = None
    if parent_path:
        with open(parent_path) as f:
            d_parent = json.load(f)
        class_parent = {}
        for parent, children in d_parent.items():
            class_parent[parent] = [
                class2idx[c] for c in children if class2idx.get(c) is not None
            ]

    subset_ids = None
    if subset_path:
        with open(subset_path) as f:
            # one class per LINE (reference utils/misc.py:314 splits on \n)
            subset = f.read().split("\n")
            subset_ids = [
                class2idx[name] for name in subset if class2idx.get(name) is not None
            ]

    return class_names, class_parent, subset_ids


def discretize(x, low_t: float = -0.5, high_t: float = 0.5,
               low: float = -1.0, high: float = 1.0):
    """Threshold values to {low, 0, high}
    (parity with utils/discretize.py:4-41; used by inspection tooling)."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    return jnp.where(x < low_t, low, jnp.where(x > high_t, high, 0.0))
