"""Canonical dispatch shapes + ahead-of-time program warm-up.

Full-model TPU compiles take minutes (the K-scanned train step 20-30 min
cold — CLAUDE.md measured numbers); a GRU config with window BUCKETING
compiles one train program PER BUCKET, so a real run could stall mid-epoch
on a fresh window count (VERDICT r3 weak #3). Two mitigations live here:

  * ``canonical_batches`` — the exact (batch, clip[, windows]) shapes the
    loaders collate, so warm-up compiles key-match the real dispatches
    bit-for-bit. Shared by ``scripts/warm_cache.py`` (standalone pre-pay
    into the persistent cache) and ``warm_compile`` below.
  * ``warm_compile`` — ``jit.lower(...).compile()`` every program
    ``train(cfg)`` will dispatch, BEFORE the epoch loop (gated by
    ``TPU.WARM_COMPILE_ON_START``). AOT compilation executes nothing (no
    optimizer step, no donation), but populates both the in-process jit
    cache and the persistent compilation cache, so the cold-start cost is
    paid predictably up front instead of surprising the first N dispatches
    (and EVERY bucket change, for GRU runs with TPU.GRU_SINGLE_BUCKET off).

The reference has no counterpart: eager torch pays no compile at all
(SURVEY §2.6); this is repo-only machinery for the XLA compilation model.
"""

from __future__ import annotations

import time

import numpy as np

from asf_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def int16_in_effect(cfg) -> bool:
    """The waveform dtype the REAL run will dispatch.

    cfg.TPU.INT16_TRANSFER alone is not enough: the datasets run a
    construct-time probe (off-PCM-grid HDF5, non-mono/non-int16 wavs) that
    can disable int16 at runtime — and then every program warmed for int16
    keys would miss the cache. Replicate the decision by constructing the
    dataset when the data is reachable; fall back to the flag (with a
    warning) when it is not.
    """
    if not cfg.TPU.INT16_TRANSFER:
        return False
    try:
        from asf_tpu.data.build import build_dataset

        ds = build_dataset(cfg.TRAIN.DATASET, cfg, "train")
        return bool(getattr(ds, "int16", False))
    except Exception as e:  # data absent: warm for the flag-derived dtype
        logger.warning(
            "warm-up could not probe the dataset (%s: %s); assuming "
            "TPU.INT16_TRANSFER holds — if the real run's probe disables "
            "int16, the warmed programs will miss the cache.",
            type(e).__name__, e,
        )
        return True


def gru_buckets(cfg) -> list[int]:
    """The window-count buckets the loader can emit (data/loader.py
    bucket_windows): [MAX_NB] under GRU_SINGLE_BUCKET, else all powers of
    two up to and including MAX_NB_SPECTROGRAMS."""
    max_n = int(cfg.AUDIO_DATA.MAX_NB_SPECTROGRAMS)
    if cfg.TPU.GRU_SINGLE_BUCKET:
        return [max_n]
    buckets, b = [], 1
    while b < max_n:
        buckets.append(b)
        b *= 2
    buckets.append(max_n)
    return sorted(set(buckets))


def warm_marker_path(cfg, int16: bool):
    """Marker file recording that this config's dispatch-program set was
    warmed into the persistent compilation cache — the cold-cache detector
    behind ``TPU.AUTO_WARM_ON_COLD_CACHE`` (VERDICT r4 next-step #5: fresh
    configs must never stall mid-epoch unannounced).

    Returns None when no persistent cache is configured (CPU runs, tests —
    ``jax_setup.enable_compilation_cache`` skips CPU backends), so auto-warm
    stays inert there. The digest keys everything that shapes the compiled
    programs (model geometry, batch shapes/dtypes, K, solver, the TPU compute
    flags, backend + device count + jax version); over-keying only costs a
    redundant warm-up, never a missed program."""
    import jax

    cache_dir = getattr(jax.config, "jax_compilation_cache_dir", None)
    if not cache_dir:
        return None
    import hashlib
    from pathlib import Path

    shapes = [
        sorted(
            (k, list(v.shape), str(v.dtype))
            for k, v in b.items()
            if hasattr(v, "shape")
        )
        for b in canonical_batches(cfg, int(cfg.TRAIN.BATCH_SIZE), int16=int16)
    ]
    key = "\n".join(
        [
            f"jax={jax.__version__}",
            f"backend={jax.default_backend()}",
            f"ndev={jax.device_count()}",
            f"shapes={shapes!r}",
            str(cfg.MODEL), str(cfg.RESNET), str(cfg.SLOWFAST),
            str(cfg.AUDIO_DATA), str(cfg.BN), str(cfg.SOLVER), str(cfg.TPU),
            f"train_bs={cfg.TRAIN.BATCH_SIZE}",
        ]
    )
    digest = hashlib.sha1(key.encode()).hexdigest()[:24]
    return Path(cache_dir) / "asf_warm_markers" / digest


def canonical_batches(cfg, batch_size: int, int16: bool | None = None):
    """Zero batches with the exact shapes/dtypes the loaders collate."""
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    if int16 is None:
        int16 = int16_in_effect(cfg)
    wave_dtype = np.int16 if int16 else np.float32
    multitask = len(cfg.MODEL.NUM_CLASSES) > 1

    def labels():
        if multitask:
            lab = {
                "verb": np.zeros((batch_size,), np.int64),
                "noun": np.zeros((batch_size,), np.int64),
            }
            if not cfg.MODEL.ONLY_ACTION_RECOGNITION:
                import pandas as pd

                n_attr = len(pd.read_csv(cfg.MODEL.PDDL_ATTRIBUTES))
                lab["precs"] = np.zeros((batch_size, n_attr), np.float32)
                lab["posts"] = np.zeros((batch_size, n_attr), np.float32)
            return lab
        return {"class_id": np.zeros((batch_size,), np.int64)}

    gru = cfg.MODEL.MODEL_NAME == "AudioSlowFastGRU"
    batches = []
    if gru:
        for nb in gru_buckets(cfg):
            batches.append(
                {
                    "waveform": np.zeros((batch_size, nb, clip), wave_dtype),
                    "n_valid": np.ones((batch_size, nb), np.int32),
                    "lengths": np.ones((batch_size,), np.int32),
                    "noun_embedding": np.zeros((batch_size, 512), np.float32),
                    "labels": labels(),
                    "index": np.arange(batch_size, dtype=np.int64),
                }
            )
    else:
        batches.append(
            {
                "waveform": np.zeros((batch_size, clip), wave_dtype),
                "n_valid": np.full((batch_size,), clip, np.int32),
                "labels": labels(),
                "index": np.arange(batch_size, dtype=np.int64),
            }
        )
    return batches


def store_lowering_spec(cfg, mesh):
    """The mega-buffer AVAL a ``train(cfg)`` run would attach — WITHOUT
    reading any audio. Segment lengths come from the dataset's
    ``device_store_table`` (annotation arithmetic only), so warm_cache.py can
    lower the FUSED train program (make_train_multi_step(store=...)) against
    a ShapeDtypeStruct and key-match the real run's compile exactly.

    Returns an object with ``.mega`` / ``.clip_samples`` / ``.pad_offset``
    (duck-typing DeviceSegmentStore for lowering purposes), or None when the
    store would not attach (unsupported dataset, over budget, data absent).
    """
    budget = int(getattr(cfg.TPU, "TRAIN_DEVICE_CACHE_MB", 0)) << 20
    if budget <= 0:
        return None
    try:
        from asf_tpu.data.build import build_dataset

        split = (
            "train+val"
            if cfg.TRAIN.DATASET.lower().startswith("epickitchens")
            and cfg.EPICKITCHENS.TRAIN_PLUS_VAL
            else "train"
        )
        ds = build_dataset(cfg.TRAIN.DATASET, cfg, split)
    except Exception as e:
        logger.warning(
            "store_lowering_spec: dataset unreachable (%s: %s) — fused "
            "program not warmed", type(e).__name__, e,
        )
        return None
    clip_samples = int(getattr(ds, "clip_samples", 0))
    itemsize = 2 if getattr(ds, "int16", False) else 4
    table_fn = getattr(ds, "device_store_table", None)
    table = table_fn(budget_samples=budget // itemsize) if callable(table_fn) else None
    if table is None:
        return None
    total = sum(max(0, int(n)) for _k, n in table) + clip_samples
    if total * itemsize > budget or total >= np.iinfo(np.int32).max:
        return None
    from asf_tpu.data.device_store import quantized_total

    total = quantized_total(
        total, itemsize, budget,
        int(getattr(cfg.TPU, "STORE_CAPACITY_QUANTUM_MB", 0)) << 20,
    )
    import jax

    from asf_tpu.parallel.mesh import replicated

    class _Spec:
        pass

    spec = _Spec()
    spec.clip_samples = clip_samples
    spec.pad_offset = total - clip_samples
    spec.mega = jax.ShapeDtypeStruct(
        (total,), np.int16 if itemsize == 2 else np.float32,
        sharding=replicated(mesh),
    )
    return spec


def _macro(b, k: int):
    return {
        key: (
            {kk: np.stack([vv] * k) for kk, vv in val.items()}
            if isinstance(val, dict)
            else np.stack([val] * k)
        )
        for key, val in b.items()
    }


def warm_compile(
    cfg, mesh, state, train_step, multi_step=None,
    metrics_step=None, eval_multi_step=None, int16: bool | None = None,
    store=None,
) -> int:
    """AOT-compile every program train(cfg) dispatches, for every loader
    shape. Returns the number of programs lowered+compiled.

    Pass ``int16`` when the caller already holds a constructed dataset
    (train(cfg) does: ``train_loader.dataset.int16``) — ``int16_in_effect``
    would otherwise rebuild the dataset and re-run the PCM-grid probe
    (head+mid read of every HDF5 video) just to recover a known bool.

    Lowering (Python tracing) is sequential, but the backend compiles run in
    a thread pool of ``TPU.WARM_COMPILE_THREADS`` workers: PJRT ``compile``
    releases the GIL and the work is server-side, so the cold-start wall
    clock is ~max(program) instead of sum(programs) wherever the backend
    compiles concurrently (persistent-cache writes are per-key files, safe
    under concurrency)."""
    import jax
    import jax.numpy as jnp

    from asf_tpu.parallel.mesh import (
        batch_sharding,
        macro_batch_sharding,
        put_with,
        shard_batch,
    )

    k = max(1, int(cfg.TPU.STEPS_PER_DISPATCH))
    batch_size = int(cfg.TRAIN.BATCH_SIZE)
    rng = jax.random.PRNGKey(0)
    bs = batch_sharding(mesh)
    ms = macro_batch_sharding(mesh)

    t_lower = time.time()
    jobs: list[tuple[str, object]] = []
    for b in canonical_batches(cfg, batch_size, int16=int16):
        shape = b["waveform"].shape
        sb = shard_batch(dict(b), mesh)
        jobs.append(
            (
                f"train single {shape}",
                train_step.lower(state, sb, jnp.float32(0.0), rng),
            )
        )
        if multi_step is not None:
            if store is not None:
                # Fused offset macro (TPU.FUSED_STORE_GATHER): the real loop
                # ships wave_start int32 grids + the store's mega-buffer, so
                # THAT is the program to pre-pay — the waveform macro never
                # dispatches in store mode. The mega operand is the live
                # device array: exact aval + sharding, zero extra upload.
                fb = dict(b)
                w = fb.pop("waveform")
                fb["wave_start"] = np.zeros(w.shape[:-1], np.int32)
                mb = put_with(_macro(fb, k), ms)
                jobs.append(
                    (
                        f"train K={k} fused {shape}",
                        multi_step.lower(
                            state, mb, jnp.zeros((k,), jnp.float32), rng,
                            store.mega,
                        ),
                    )
                )
            else:
                mb = put_with(_macro(b, k), ms)
                jobs.append(
                    (
                        f"train K={k} {shape}",
                        multi_step.lower(state, mb, jnp.zeros((k,), jnp.float32), rng),
                    )
                )
        if metrics_step is not None:
            mask = put_with(np.ones((batch_size,), np.float32), bs)
            jobs.append(
                (
                    f"eval metrics {shape}",
                    metrics_step.lower(state, shard_batch(dict(b), mesh), mask),
                )
            )
        if eval_multi_step is not None:
            masks = put_with(np.ones((k, batch_size), np.float32), ms)
            jobs.append(
                (
                    f"eval K={k} {shape}",
                    eval_multi_step.lower(state, put_with(_macro(b, k), ms), masks),
                )
            )
    logger.info("[warm] lowered %d programs in %.1fs", len(jobs), time.time() - t_lower)

    def _compile(job):
        label, lowered = job
        t0 = time.time()
        lowered.compile()
        logger.info("[warm] %s: %.1fs", label, time.time() - t0)

    threads = max(1, int(getattr(cfg.TPU, "WARM_COMPILE_THREADS", 1)))
    if threads == 1 or len(jobs) <= 1:
        for job in jobs:
            _compile(job)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(threads, len(jobs))) as pool:
            list(pool.map(_compile, jobs))
    return len(jobs)
