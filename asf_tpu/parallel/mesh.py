"""Device mesh + sharding helpers.

Replaces the reference's distributed runtime
(/root/reference/audio_slowfast/utils/{multiprocessing,distributed}.py and
``launch_job``, utils/misc.py:234-262): no process-per-GPU spawn, no NCCL
process groups. A single JAX controller drives an N-device
``jax.sharding.Mesh`` with one ``data`` axis; batches are sharded on it, the
model is replicated, and XLA emits the gradient/metric all-reduces over ICI.
Multi-host runs initialise via ``jax.distributed.initialize`` and shard the
record list per host (loader rank/world_size — the DistributedSampler
equivalent).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(cfg=None, num_devices: Optional[int] = None, local: bool = False) -> Mesh:
    """Data-parallel mesh, optionally 2-D (data, model) for tensor
    parallelism. Device count precedence: explicit ``num_devices`` >
    TPU.DATA_PARALLEL > NUM_GPUS (reference flag; only values > 1 cap — 0/1
    mean 'all available') > all devices. ``local=True`` builds a host-local mesh
    (this process's devices only) — used by the test loop under multi-host,
    where every host scores the full test set independently instead of
    gathering predictions (reference all_gather, tools/test_net.py:196-203)."""
    devices = jax.local_devices() if local else jax.devices()
    n = num_devices
    mp = 1
    if cfg is not None and "TPU" in cfg:
        mp = max(1, getattr(cfg.TPU, "MODEL_PARALLEL", 1))
    if n is None and cfg is not None:
        req = getattr(cfg.TPU, "DATA_PARALLEL", 0) if "TPU" in cfg else 0
        if not req:
            req = cfg.NUM_GPUS if cfg.NUM_GPUS and cfg.NUM_GPUS > 1 else 0
        n = (req * mp) if req else len(devices)
    n = min(n or len(devices), len(devices))
    if mp > 1:
        assert n % mp == 0, f"{n} devices not divisible by MODEL_PARALLEL={mp}"
        grid = np.asarray(devices[:n]).reshape(n // mp, mp)
        return Mesh(grid, ("data", "model"))
    return Mesh(np.asarray(devices[:n]), ("data",))


def check_batch_divisibility(cfg, mesh: Mesh, batch_size: int, which: str):
    """Fail fast with an actionable message: shard_batch would otherwise die
    mid-loop (after minutes of compiles) with a bare XLA shape error when the
    batch axis does not divide the mesh's data axis (e.g. NUM_GPUS=1 configs
    on a multi-device host, where 1 means 'all available').

    ``batch_size`` is the PER-PROCESS batch size (the loader yields rank
    shards under multi-host); when the mesh spans processes the global batch
    is ``batch_size * process_count`` rows assembled by
    ``make_array_from_process_local_data``, so the requirement is
    ``batch_size % (dp / process_count) == 0``, i.e. per-process batch %
    per-process slice of the data axis."""
    dp = int(mesh.shape.get("data", mesh.devices.size))
    if mesh_spans_processes(mesh):
        nproc = len({d.process_index for d in mesh.devices.flat})
        local_dp, rem = divmod(dp, nproc)
        # A data axis not evenly split over processes means the rank-shard
        # assembly itself is invalid; report that instead of a batch hint.
        if rem:
            raise ValueError(
                f"mesh data axis {dp} is not divisible by the process count "
                f"{nproc} (mesh shape {dict(mesh.shape)}); per-process batch "
                f"assembly requires an even split."
            )
        dp = local_dp
    if batch_size % dp != 0:
        raise ValueError(
            f"{which}.BATCH_SIZE={batch_size} (per-process) is not divisible "
            f"by this process's share of the mesh data axis, {dp} (mesh "
            f"shape {dict(mesh.shape)}). Set TPU.DATA_PARALLEL (or "
            f"NUM_GPUS>1) to a divisor, or adjust the batch size."
        )


def data_parallel_size(cfg=None) -> int:
    """Size of the 'data' axis of the mesh ``make_mesh(cfg)`` would build.

    Used by sync_batchnorm to derive its device-group count without holding
    a mesh reference inside the model (models stay mesh-agnostic)."""
    try:
        return int(make_mesh(cfg).shape["data"])
    except RuntimeError:  # no backend initialised (e.g. docs build)
        return 1


def param_shardings(tree, mesh: Mesh, min_dim: int = 128):
    """Place a param-like tree: wide trailing (output-channel) axes shard on
    'model' when present, everything else replicates. GSPMD propagates the
    activation shardings and inserts the all-gathers/reduce-scatters.
    """
    if "model" not in mesh.axis_names:
        return replicate_tree(tree, mesh)
    mp = mesh.shape["model"]

    def put(x):
        shape = getattr(x, "shape", ())
        if (
            len(shape) >= 2
            and shape[-1] % mp == 0
            and shape[-1] >= min_dim * mp
        ):
            spec = P(*([None] * (len(shape) - 1) + ["model"]))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(put, tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def mesh_spans_processes(mesh: Mesh) -> bool:
    """True when the mesh includes devices from more than one host process —
    batch arrays must then be assembled from per-process rank-shards via
    ``jax.make_array_from_process_local_data`` instead of ``device_put``."""
    try:
        return len({d.process_index for d in mesh.devices.flat}) > 1
    except Exception:
        return False


def put_with(tree, sharding: Optional[NamedSharding]):
    """device_put a pytree onto ``sharding``, assembling from per-process
    rank-shards via ``jax.make_array_from_process_local_data`` when the mesh
    spans processes (each host holds only its slice of the sharded axes).
    ``sharding=None`` falls back to a plain on-default-device jnp.asarray.

    Used by the fused eval/test dispatch paths so multi-host runs take the
    same assembly route as shard_batch/DevicePrefetcher."""
    import jax.numpy as jnp

    if sharding is None:
        return jax.tree.map(jnp.asarray, tree)
    if mesh_spans_processes(sharding.mesh):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def macro_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for stacked multi-step batches: leading axis is the step
    index K (unsharded scan axis), axis 1 is the per-step batch split over
    'data' (see engine/steps.py make_train_multi_step)."""
    return NamedSharding(mesh, P(None, "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place batch arrays with the leading axis split over 'data'.

    Multi-host: each process passes its rank-shard of the global batch (the
    loader rank-splits indices), so the global array is assembled from
    per-process slices instead of device_put (which expects global data)."""
    bs = batch_sharding(mesh)
    multiproc = mesh_spans_processes(mesh)

    def put(x):
        if isinstance(x, np.ndarray) and x.dtype != object and x.ndim >= 1:
            if multiproc:
                return jax.make_array_from_process_local_data(bs, x)
            return jax.device_put(x, bs)
        return x

    return jax.tree.map(put, batch)


def replicate_tree(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def pad_batch_to(batch_np: dict, target: int):
    """Pad a ragged final batch to ``target`` rows; returns (batch, n_real).

    TPU needs static batch shapes; callers mask out the padded rows when
    reducing metrics (the reference simply ran a smaller last batch).
    """
    n_real = len(batch_np["index"])
    if n_real == target:
        return batch_np, n_real

    def pad(x):
        if isinstance(x, np.ndarray) and x.ndim >= 1 and x.shape[0] == n_real:
            reps = [(0, target - n_real)] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, reps, mode="edge")
        return x

    import jax

    return jax.tree.map(pad, batch_np), n_real
