"""HBM-resident train segment store: epochs feed offsets, not waveforms.

The reference re-reads and re-uploads every record's audio every epoch
(/root/reference/audio_slowfast/tools/train_net.py:412-422 — its DataLoader
workers restart the dataset pass each epoch, and every batch crosses PCIe
again). On a wire-constrained host that re-transfer IS the training-loop
bottleneck (PROFILE.md §2: the measured real `train(cfg)` loop sits ~13x
below the device-bound step because each 128-clip batch ships ~7.9 MB over
a ~50 MB/s link).

TPU-native fix: the unique record SEGMENTS are concatenated into one int16
mega-buffer, uploaded to HBM once (replicated over the mesh), and every
epoch's batches are assembled ON DEVICE by a tiny jitted gather —
``dynamic_slice`` per clip + an iota mask reproducing the host path's
zero-padding bit-exactly. The loader then yields only int32 clip offsets,
labels and valid-sample counts (a few KB per batch instead of MB), and the
train step's input signature is UNCHANGED (the gather materialises the same
(B, S) / (K, B, S) waveform array the H2D upload used to), so all warmed /
cached step programs still key-match.

GRU chain items gather as (B, Nb) offset grids into stored chain regions
(one dynamic_slice per window); regular items as (B,) clip offsets. Test
mode gathers every NUM_ENSEMBLE_VIEWS clip from ONE stored segment.

Multi-host meshes work too: every process holds the identical dataset (the
loader only rank-shards the INDEX order), so each builds the same mega-buffer
and contributes its addressable shards of the replicated upload
(``make_array_from_callback``); per-process offset shards are assembled into
global arrays with ``make_array_from_process_local_data`` before the gather —
the same assembly route ``shard_batch`` takes for streamed batches. The
store/stream decision is a deterministic function of the shared annotation
files + config, so all processes agree on it.

Scope guards (``try_build`` returns None and the loop streams as before):
  * datasets must offer the ref protocol (``device_store_table`` /
    ``get_ref`` / ``read_segment`` — EpicKitchens family incl. GRU,
    Vggsound);
  * any record with a host-side waveform transformation disables the store
    (augmentation must see float samples on the host);
  * total segment bytes must fit the MB budget
    (``TPU.TRAIN_DEVICE_CACHE_MB`` / ``TPU.TEST_DEVICE_CACHE_MB``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from asf_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def quantized_total(total: int, itemsize: int, budget_bytes: int,
                    quantum_bytes: int) -> int:
    """Round the mega-buffer sample count up to the capacity quantum.

    The fused train program bakes the mega shape into its compile key, so an
    exactly-sized buffer recompiles the K-scanned dispatch whenever the
    dataset grows (a 503 s hit measured in PROFILE.md §0d-2). Rounding the
    capacity up to ``TPU.STORE_CAPACITY_QUANTUM_MB`` keeps the compile key
    stable across dataset sizes in the same bucket and lets
    ``scripts/warm_cache.py`` / the AOT warm-up key-match real runs; the
    extra tail is zeros (gather-correct: any offset into it reads pad).
    Two regimes so tiny (test/dev) stores don't balloon to the quantum:
    below ``quantum_bytes`` the capacity rounds up to the next power of two
    (waste ≤2×, still bucket-stable); at or above it, up to the next quantum
    multiple (waste ≤ quantum). Falls back to the exact size when the
    rounded buffer would exceed the budget or int32 addressing.
    """
    if quantum_bytes <= 0:
        return total
    tb = total * itemsize
    if tb < quantum_bytes:
        cap = 1
        while cap < tb:
            cap <<= 1
    else:
        cap = ((tb + quantum_bytes - 1) // quantum_bytes) * quantum_bytes
    tq = max(cap // itemsize, total)
    if tq * itemsize > budget_bytes or tq >= np.iinfo(np.int32).max:
        return total
    return tq


class DeviceSegmentStore:
    """One device-resident buffer of all record segments + a gather program.

    Build via :meth:`try_build`; then ``base(seg_key)`` gives a segment's
    offset into the mega-buffer and ``gather(starts, n_valid, macro)``
    materialises waveform batches on device.
    """

    def __init__(self, mega_np: np.ndarray, bases: dict, clip_samples: int, mesh=None):
        import jax

        self.clip_samples = int(clip_samples)
        self.dtype = mega_np.dtype
        self._bases = bases
        self.mesh = mesh
        self.nbytes = int(mega_np.nbytes)
        # Start of the trailing all-zero pad: a window gathered from here
        # (with n_valid=1) reproduces collate's all-zero padded GRU rows.
        self.pad_offset = int(mega_np.shape[0] - clip_samples)
        self._multiproc = False
        if mesh is not None:
            from asf_tpu.parallel.mesh import mesh_spans_processes, replicated

            rep = replicated(mesh)
            self._multiproc = mesh_spans_processes(mesh)
            if self._multiproc:
                # device_put expects addressable devices only; provide each
                # local device's (full, replicated) shard from the host copy
                # every process built identically.
                self._mega = jax.make_array_from_callback(
                    mega_np.shape, rep, lambda idx: mega_np[idx]
                )
            else:
                self._mega = jax.device_put(mega_np, rep)
        else:
            self._mega = jax.device_put(mega_np)
        self._gathers = {}  # (starts_ndim, macro) -> jitted gather

    # -- build ---------------------------------------------------------------
    @classmethod
    def try_build(cls, dataset, budget_bytes: int, mesh=None,
                  quantum_bytes: int = 0) -> Optional["DeviceSegmentStore"]:
        if budget_bytes <= 0:
            return None
        clip_samples = int(getattr(dataset, "clip_samples", 0))
        itemsize = 2 if getattr(dataset, "int16", False) else 4
        budget_samples = budget_bytes // itemsize
        table_fn = getattr(dataset, "device_store_table", None)
        table = (
            table_fn(budget_samples=budget_samples) if callable(table_fn) else None
        )
        if table is None:
            logger.info(
                "Device segment store disabled: %s does not support the "
                "ref/gather path here (host waveform transforms, or the set "
                "exceeds the budget)", type(dataset).__name__,
            )
            return None
        lengths = [max(0, int(n)) for (_k, n) in table]
        total = sum(lengths) + clip_samples  # trailing pad: slices never clamp
        if total * itemsize > budget_bytes:
            logger.warning(
                "Device segment store disabled: %d segments need %.0f MB > "
                "budget %.0f MB", len(table), total * itemsize / 2**20,
                budget_bytes / 2**20,
            )
            return None
        if total >= np.iinfo(np.int32).max:
            logger.warning("Device segment store disabled: >2^31 samples")
            return None
        total = quantized_total(total, itemsize, budget_bytes, quantum_bytes)

        dtype = np.int16 if itemsize == 2 else np.float32
        mega = np.zeros((total,), dtype)
        bases, off = {}, 0
        for (key, _n), n in zip(table, lengths):
            if n > 0:
                seg = dataset.read_segment(key)
                if seg.shape != (n,) or seg.dtype != dtype:
                    logger.warning(
                        "Device segment store disabled: segment %s is "
                        "%s/%s, expected (%d,)/%s", key, seg.shape, seg.dtype,
                        n, dtype,
                    )
                    return None
                mega[off : off + n] = seg
            bases[key] = off
            off += n
        store = cls(mega, bases, clip_samples, mesh)
        logger.info(
            "Device segment store: %d segments, %.1f MB resident in HBM — "
            "train epochs ship int32 offsets instead of waveforms",
            len(table), store.nbytes / 2**20,
        )
        return store

    # -- lookup / gather -------------------------------------------------------
    def base(self, seg_key) -> int:
        return self._bases[seg_key]

    @property
    def mega(self):
        """The device-resident mega-buffer (replicated over the mesh) — the
        operand the FUSED train dispatch gathers from in-graph
        (engine/steps.py make_train_multi_step(store=...))."""
        return self._mega

    def _make_gather(self, ndim: int, macro: bool):
        import jax

        S = self.clip_samples

        def fn(mega, starts, n_valid):
            return gather_in_graph(mega, starts, n_valid, S)

        if self.mesh is not None:
            from asf_tpu.parallel.mesh import batch_sharding, macro_batch_sharding

            out = macro_batch_sharding(self.mesh) if macro else batch_sharding(self.mesh)
            return jax.jit(fn, out_shardings=out)
        return jax.jit(fn)

    def gather(self, starts: np.ndarray, n_valid: np.ndarray, macro: bool):
        """int32 clip offsets -> device waveforms, one trailing (S,) axis per
        offset: (B,)->(B,S) regular, (B,Nb)->(B,Nb,S) GRU chains, plus a
        leading (K,) axis for stacked macro dispatches (``macro=True`` picks
        the macro batch sharding, which shards axis 1 instead of axis 0).

        Bit-identical to the host assembly: samples past ``n_valid`` are
        zeroed exactly as the host's zero-initialised clip buffers were.

        Multi-host: ``starts``/``n_valid`` are this process's rank shard of
        the batch axis (the loader rank-shards records); they are assembled
        into global arrays here, exactly like ``shard_batch`` does for
        streamed waveforms.
        """
        starts = np.asarray(starts, np.int32)
        n_valid = np.asarray(n_valid, np.int32)
        key = (starts.ndim, macro)
        g = self._gathers.get(key)
        if g is None:
            g = self._gathers[key] = self._make_gather(*key)
        if self._multiproc:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = [None] * starts.ndim
            spec[1 if macro else 0] = "data"
            sh = NamedSharding(self.mesh, P(*spec))
            starts = jax.make_array_from_process_local_data(sh, starts)
            n_valid = jax.make_array_from_process_local_data(sh, n_valid)
        return g(self._mega, starts, n_valid)


def gather_in_graph(mega, starts, n_valid, clip_samples: int):
    """Offset gather as a pure traced function: (…,)-shaped int32 ``starts``
    into ``mega`` -> (…, S) waveforms, samples past ``n_valid`` zeroed.

    This is THE gather — the store's standalone jitted programs wrap it, and
    the fused train dispatch (engine/steps.py ``make_train_multi_step`` with
    ``store=``) inlines it into the scan body so a K-step macro costs ONE
    relay dispatch with no (K, B, S) assembled intermediate: XLA fuses the
    per-step (B, S) gather straight into the DSP front end."""
    import jax
    import jax.numpy as jnp

    S = int(clip_samples)
    iota = jnp.arange(S, dtype=jnp.int32)

    def one(mega, s, nv):
        w = jax.lax.dynamic_slice(mega, (s,), (S,))
        return jnp.where(iota < nv, w, jnp.zeros((), w.dtype))

    f = one
    for _ in range(starts.ndim):  # one vmap per leading offset axis
        f = jax.vmap(f, in_axes=(None, 0, 0))
    return f(mega, starts, n_valid)


def resolve_offsets(batch, store: Optional[DeviceSegmentStore], put,
                    macro: bool = False):
    """Turn an offset batch (``wave_start``) into a regular device batch.

    Gathers the waveform from the HBM-resident mega-buffer and runs ``put``
    (shard_batch / put_with / device_put closure) over the tiny rest. The
    result is indistinguishable from an uploaded batch — same keys, shapes
    and dtypes — so jitted step programs key-match. Passthrough (``put``
    only) for ordinary waveform batches or ``store=None``. Shared by
    DevicePrefetcher._resolve and test_loop.perform_test.

    ``macro`` must say whether the caller stacked a leading (K, ...) macro
    axis (the gather then takes the macro batch sharding, which shards axis 1
    instead of axis 0) — the callers build the stack themselves, so they
    know; inferring it from array ranks would silently flip on a batch-schema
    change.
    """
    if store is None or "wave_start" not in batch:
        return put(batch)
    batch = dict(batch)
    starts = np.asarray(batch.pop("wave_start"))
    wf = store.gather(starts, batch["n_valid"], macro=macro)
    dev = put(batch)
    dev["waveform"] = wf
    return dev


def collate_refs(items, store: DeviceSegmentStore, max_windows=None,
                 single_bucket: bool = False):
    """Collate ref items (``dataset.get_ref``) into an offset batch.

    Mirrors ``loader.collate`` for every non-waveform field; the waveform is
    represented by ``wave_start`` (absolute int32 offsets into the store's
    mega-buffer), resolved to a real device array by the prefetcher's
    ``store.gather`` call. GRU chain refs (``window_offs``) collate to
    (B, Nb) offset grids with loader.collate's window-count bucketing;
    bucket-padding windows (and the off<0 sentinel for degenerate empty
    chunks) point at the mega-buffer's trailing zero pad with n_valid=1, so
    the gather reproduces collate's all-zero padded rows bit-exactly.
    """
    first = items[0]
    if "window_offs" in first:  # GRU chain refs
        from .loader import bucket_windows

        n_max = max(int(it["length"]) for it in items)
        nb = bucket_windows(n_max, max_windows or n_max)
        if single_bucket and max_windows:
            nb = max_windows
        pad = store.pad_offset
        starts = np.full((len(items), nb), pad, np.int32)
        n_valid = np.ones((len(items), nb), np.int32)
        lengths = np.zeros((len(items),), np.int32)
        for i, it in enumerate(items):
            n = min(int(it["length"]), nb)
            offs = np.asarray(it["window_offs"][:n], np.int64)
            base = store.base(it["seg_key"])
            starts[i, :n] = np.where(offs < 0, pad, base + offs).astype(np.int32)
            n_valid[i, :n] = it["n_valid"][:n]
            lengths[i] = n
        out = {"wave_start": starts, "n_valid": n_valid, "lengths": lengths}
        if "noun_embedding" in first:
            out["noun_embedding"] = np.stack(
                [it["noun_embedding"] for it in items]
            )
        out["labels"] = {
            k: np.asarray(np.stack([np.asarray(it["label"][k]) for it in items]))
            for k in first["label"].keys()
        }
        out["index"] = np.asarray([it["index"] for it in items], np.int64)
        out["metadata"] = {
            k: [it["metadata"][k] for it in items]
            for k in first["metadata"].keys()
        }
        return out
    out = {
        "wave_start": np.asarray(
            [store.base(it["seg_key"]) + int(it["clip_off"]) for it in items],
            np.int32,
        ),
        "n_valid": np.asarray([it["n_valid"] for it in items], np.int32),
    }
    out["labels"] = {
        k: np.asarray(np.stack([np.asarray(it["label"][k]) for it in items]))
        for k in first["label"].keys()
    }
    out["index"] = np.asarray([it["index"] for it in items], np.int64)
    out["metadata"] = {
        k: [it["metadata"][k] for it in items] for k in first["metadata"].keys()
    }
    return out
