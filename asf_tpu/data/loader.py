"""Batch loader: threaded item fetch, static-shape collation, device prefetch.

Replaces the reference's torch DataLoader stack
(/root/reference/audio_slowfast/datasets/loader.py:66-134). Design for TPU:

  * Worker THREADS instead of processes: item work is h5py/numpy (GIL-
    releasing); the heavy DSP moved on-device, so processes buy nothing.
  * Static shapes: GRU window chains are padded to bucketed window counts
    (powers of two up to MAX_NB_SPECTROGRAMS) so XLA compiles a handful of
    shapes instead of one per batch (the reference pads to the ragged batch
    max, loader.py:18-43 — fine for eager torch, poison for jit).
  * ``prefetch_to_device`` keeps PREFETCH_DEPTH batches in flight to HBM so
    the TPU never waits on the host (replaces pinned-memory + non_blocking
    H2D copies, tools/train_net.py:412-422).
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from .build import build_dataset

# import for registration side effects
from . import epickitchens as _ek  # noqa: F401
from . import epickitchens_slide as _eks  # noqa: F401
from . import vggsound as _vgg  # noqa: F401


def bucket_windows(n: int, max_n: int) -> int:
    """Round n up to the next power-of-two bucket, capped at max_n."""
    b = 1
    while b < n:
        b *= 2
    return min(b, max_n)


def collate(items: List[Dict[str, Any]], max_windows: Optional[int] = None,
            single_bucket: bool = False) -> Dict[str, Any]:
    """Stack item dicts into batch arrays.

    Regular items -> waveform (B, S); GRU items -> waveform (B, Nb, S) with
    window-count bucketing, lengths (B,), noun_embedding (B, 512).
    Labels become a dict of stacked arrays (parity with
    epickitchens_collate_fn, loader.py:18-63).
    """
    first = items[0]
    out: Dict[str, Any] = {}

    if first["waveform"].ndim == 2:  # GRU chain items (N_i, S)
        n_max = max(int(it["length"]) for it in items)
        nb = bucket_windows(n_max, max_windows or n_max)
        if single_bucket and max_windows:
            # one static window shape for the whole run: wastes compute on
            # short chains but bounds jit recompiles to exactly one (each
            # bucket is a distinct train-step compile, minutes each on TPU)
            nb = max_windows
        s = first["waveform"].shape[1]
        # Keep the int16 wire format through collation when EVERY chain is
        # raw PCM (TPU.INT16_TRANSFER; the device pipeline applies the
        # deferred /32768). A float32 buffer here would silently absorb raw
        # PCM at ~32768x amplitude — the dtype check the pipeline keys on
        # only sees the collated batch.
        all_int16 = all(it["waveform"].dtype == np.int16 for it in items)
        waves = np.zeros(
            (len(items), nb, s), np.int16 if all_int16 else np.float32
        )
        n_valid = np.zeros((len(items), nb), np.int32)
        lengths = np.zeros((len(items),), np.int32)
        for i, it in enumerate(items):
            n = min(int(it["length"]), nb)
            w = it["waveform"][:n]
            if not all_int16 and w.dtype == np.int16:
                # mixed batch: apply the deferred PCM scale on the odd rows
                w = w.astype(np.float32) / 32768.0
            waves[i, :n] = w
            n_valid[i, :n] = it["n_valid"][:n]
            # padded windows: replicate n_valid=1 to keep the on-device
            # edge-pad gather well-defined; their outputs are length-masked.
            n_valid[i, n:] = 1
            lengths[i] = n
        out["waveform"] = waves
        out["n_valid"] = n_valid
        out["lengths"] = lengths
        if "noun_embedding" in first:
            out["noun_embedding"] = np.stack([it["noun_embedding"] for it in items])
    else:
        waves = [it["waveform"] for it in items]
        if len({w.dtype for w in waves}) > 1:
            # Mixed int16-PCM / float items in one batch (a non-mono/non-int16
            # file fell back to scaled float32 while TPU.INT16_TRANSFER is
            # on). np.stack would silently promote raw PCM to float at
            # ~32768x amplitude; apply the deferred /32768 scale here instead
            # so every row is in float [-1, 1].
            waves = [
                w.astype(np.float32) / 32768.0
                if w.dtype == np.int16
                else w.astype(np.float32)
                for w in waves
            ]
        out["waveform"] = np.stack(waves)
        out["n_valid"] = np.asarray([it["n_valid"] for it in items], np.int32)

    label_keys = first["label"].keys()
    out["labels"] = {
        k: np.asarray(np.stack([np.asarray(it["label"][k]) for it in items]))
        for k in label_keys
    }
    out["index"] = np.asarray([it["index"] for it in items], np.int64)
    out["metadata"] = {
        k: [it["metadata"][k] for it in items] for k in first["metadata"].keys()
    }
    return out


class AsfLoader:
    """Iterable over collated numpy batches with a worker thread pool."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool,
        drop_last: bool,
        num_workers: int = 8,
        seed: int = 0,
        max_windows: Optional[int] = None,
        rank: int = 0,
        world_size: int = 1,
        single_bucket: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.epoch = 0
        self.max_windows = max_windows
        self.rank = rank
        self.world_size = world_size
        self.single_bucket = single_bucket
        # Device segment store (data/device_store.py): when attached, batches
        # carry int32 clip offsets instead of waveforms and the prefetcher
        # gathers the audio from HBM — the per-epoch H2D wire disappears.
        self.device_store = None
        self._store_bases = None
        # One pool for the loader's LIFETIME, not per epoch: datasets keep a
        # per-thread h5py handle in threading.local, so fresh threads every
        # epoch would open NUM_WORKERS new HDF5 handles per epoch and leak
        # the old ones until GC (multi-hundred-epoch runs exhaust fds).
        self._pool: Optional[cf.ThreadPoolExecutor] = None

    def _get_pool(self) -> cf.ThreadPoolExecutor:
        if self._pool is None:
            self._pool = cf.ThreadPoolExecutor(
                max_workers=self.num_workers, thread_name_prefix="asf-loader"
            )
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def set_epoch(self, epoch: int):
        """Parity with DistributedSampler.set_epoch (loader.py:120-134).

        Reshuffles the index order AND re-keys the dataset's per-item rng
        stream (clip starts, waveform transforms)."""
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.world_size > 1:  # multi-host shard split (DCN-level)
            # Wrap-pad so every rank yields the SAME number of items (torch
            # DistributedSampler semantics, reference datasets/utils.py:87):
            # under multi-host jit, unequal batch counts desync the hosts at
            # the first collective of the extra batch.
            total = -(-n // self.world_size) * self.world_size
            if total > n:
                idx = np.concatenate([idx, idx[: total - n]])
            idx = idx[self.rank :: self.world_size]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def attach_store(self, store) -> None:
        """Switch this loader to offset batches resolved by ``store``."""
        self.device_store = store
        self._store_bases = None

    def _ref_base_arr(self) -> Optional[np.ndarray]:
        """Mega-buffer base offset per ``ref_seg_keys`` entry (cached) — the
        lookup that turns a vectorized ref batch's ``seg_idx`` into absolute
        ``wave_start`` offsets without per-item ``store.base`` calls."""
        if self._store_bases is None:
            keys_fn = getattr(self.dataset, "ref_seg_keys", None)
            keys = keys_fn() if keys_fn is not None else None
            if keys is None:
                return None
            self._store_bases = np.asarray(
                [self.device_store.base(k) for k in keys], np.int64
            )
        return self._store_bases

    def _refs_batch_vec(self, chunk: np.ndarray) -> Optional[Dict[str, Any]]:
        """One offset batch via the dataset's vectorized ref path
        (``get_refs_batch`` + fast_rng), bit-identical to
        ``collate_refs(pool.map(get_ref, chunk))`` (tests/test_fast_rng.py)
        but free of the per-item Python that dominates store-mode host time
        on few-core hosts (PROFILE.md §0c). None -> scalar fallback."""
        fn = getattr(self.dataset, "get_refs_batch", None)
        if fn is None:
            return None
        arrs = fn(chunk)
        if arrs is None:
            return None
        bases = self._ref_base_arr()
        if bases is None:
            return None
        if "window_offs" in arrs:  # GRU chain grids — collate_refs bucketing
            lengths = np.asarray(arrs["lengths"], np.int32)
            n_max = int(lengths.max())
            nb = bucket_windows(n_max, self.max_windows or n_max)
            if self.single_bucket and self.max_windows:
                nb = self.max_windows
            offs = arrs["window_offs"][:, :nb]
            n_valid = np.ascontiguousarray(arrs["n_valid"][:, :nb])
            pad = self.device_store.pad_offset
            base_col = bases[arrs["seg_idx"]][:, None]
            starts = np.where(offs < 0, pad, base_col + offs).astype(np.int32)
            out = {
                "wave_start": starts,
                "n_valid": n_valid,
                "lengths": np.minimum(lengths, nb),
                "labels": arrs["labels"],
                "index": arrs["index"],
                "metadata": arrs["metadata"],
            }
            if "noun_embedding" in arrs:
                out["noun_embedding"] = arrs["noun_embedding"]
            return out
        start = bases[arrs["seg_idx"]] + arrs["clip_off"]
        return {
            "wave_start": start.astype(np.int32),
            "n_valid": arrs["n_valid"],
            "labels": arrs["labels"],
            "index": arrs["index"],
            "metadata": arrs["metadata"],
        }

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        idx = self._indices()
        nb = len(self)
        pool = self._get_pool()
        if self.device_store is not None:
            from .device_store import collate_refs

            for b in range(nb):
                chunk = idx[b * self.batch_size : (b + 1) * self.batch_size]
                if len(chunk) == 0:
                    break
                batch = self._refs_batch_vec(chunk)
                if batch is not None:
                    yield batch
                    continue
                items = list(pool.map(self.dataset.get_ref, chunk))
                yield collate_refs(
                    items, self.device_store,
                    self.max_windows, self.single_bucket,
                )
            return
        for b in range(nb):
            chunk = idx[b * self.batch_size : (b + 1) * self.batch_size]
            if len(chunk) == 0:
                break
            items = list(pool.map(self.dataset.__getitem__, chunk))
            yield collate(items, self.max_windows, self.single_bucket)


def construct_loader(cfg, split: str) -> AsfLoader:
    """Parity with loader.construct_loader (loader.py:66-117)."""
    assert split in ["train", "val", "test", "train+val"]
    if split in ["train", "train+val"]:
        dataset_name = cfg.TRAIN.DATASET
        batch_size = cfg.TRAIN.BATCH_SIZE
        shuffle, drop_last = True, True
    elif split == "val":
        dataset_name = cfg.TRAIN.DATASET
        batch_size = cfg.TRAIN.BATCH_SIZE
        shuffle, drop_last = False, False
    else:
        dataset_name = cfg.TEST.DATASET
        batch_size = cfg.TEST.BATCH_SIZE
        shuffle, drop_last = False, False

    dataset = build_dataset(dataset_name, cfg, split)
    return AsfLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        drop_last=drop_last,
        num_workers=cfg.DATA_LOADER.NUM_WORKERS,
        seed=cfg.RNG_SEED,
        max_windows=cfg.AUDIO_DATA.MAX_NB_SPECTROGRAMS,
        rank=cfg.SHARD_ID,
        world_size=cfg.NUM_SHARDS,
        single_bucket=bool(cfg.TPU.GRU_SINGLE_BUCKET) if "TPU" in cfg else False,
    )


def shuffle_dataset(loader: AsfLoader, cur_epoch: int):
    """Parity with loader.shuffle_dataset (loader.py:120-134)."""
    loader.set_epoch(cur_epoch)


def iter_prefetched(loader, cfg, mesh=None, group: int = 1, lr_fn=None):
    """Iterate ``loader`` with PREFETCH_DEPTH batches uploaded ahead to HBM
    (batch axis sharded over the mesh's 'data' axis). Depth 0 disables.

    With ``group=K > 1`` (multi-step dispatch, engine/steps.py
    ``make_train_multi_step``), consecutive same-shape batches are stacked
    into macro-batches with a leading (K, ...) axis before upload, and items
    are yielded TAGGED: ``("macro", batch, lr_dev)`` for full K-groups and
    ``("single", batch, lr_dev)`` for remainders (epoch tail, GRU
    bucket-shape changes). Metadata is dropped in grouped mode (train loop
    discards it).

    ``lr_fn(step_index) -> float`` (optional): per-iteration learning rates
    are computed AND uploaded on the prefetch thread ((K,) vector for macro
    items, scalar for singles) so the dispatch loop never pays a relay
    round-trip for them; ``lr_dev`` is None when no lr_fn is given."""
    depth = int(getattr(cfg.TPU, "PREFETCH_DEPTH", 0)) if "TPU" in cfg else 0
    sharding = macro_sharding = None
    if mesh is not None:
        from asf_tpu.parallel.mesh import batch_sharding, macro_batch_sharding

        sharding = batch_sharding(mesh)
        macro_sharding = macro_batch_sharding(mesh)
    store = getattr(loader, "device_store", None)
    if depth <= 0 and group <= 1 and store is None:
        return iter(loader)
    return DevicePrefetcher(
        iter(loader),
        depth=max(1, depth),
        sharding=sharding,
        group=group,
        macro_sharding=macro_sharding,
        lr_fn=lr_fn,
        store=store,
        fuse_store=bool(getattr(cfg.TPU, "FUSED_STORE_GATHER", True))
        if "TPU" in cfg
        else False,
    )


class DevicePrefetcher:
    """Wrap a batch iterator; keeps up to ``depth`` batches uploaded ahead.

    The upload happens on a background thread via jax.device_put, so host
    collation and H2D transfer overlap device compute.
    """

    def __init__(
        self,
        it: Iterator[Dict[str, Any]],
        depth: int = 2,
        sharding=None,
        group: int = 1,
        macro_sharding=None,
        lr_fn=None,
        store=None,
        fuse_store: bool = False,
    ):
        import jax

        self._jax = jax
        self.it = it
        self.depth = depth
        self.sharding = sharding
        self.group = max(1, group)
        self.macro_sharding = macro_sharding
        self.lr_fn = lr_fn
        self.store = store  # DeviceSegmentStore: resolve offset batches
        # Fused mode: macro offset batches are NOT resolved here — the tiny
        # wave_start arrays upload as-is and the train dispatch gathers
        # in-graph (engine/steps.py make_train_multi_step(store=...)).
        # Epoch-tail singles still resolve (the single-step program keeps
        # its waveform signature).
        self.fuse_store = bool(fuse_store) and store is not None
        self._step_idx = 0  # running per-item index feeding lr_fn
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._consume_fns = {}
        self._stopped = False
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def stop(self):
        """Terminate the worker early (consumer breaking mid-epoch) — else it
        blocks forever on the full queue, leaking a thread per invocation."""
        self._stopped = True
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass

    def _qput(self, item):
        while not self._stopped:
            try:
                self.q.put(item, timeout=0.25)
                return
            except queue.Full:
                continue
        raise _PrefetchStopped()

    def _force_transfer(self, batch):
        """Materialise the waveform on device NOW, on this thread.

        Through the TPU dispatch relay, ``device_put`` only STAGES the host
        payload — the ~55 MB/s wire transfer happens lazily when a dispatch
        first consumes the buffer, which would serialise it with the train
        step on the main thread. Dispatching a trivial reduction here (and
        blocking on it) pays the wire on the prefetch thread instead, so
        transfer overlaps compute. block_until_ready alone does NOT force it.
        """
        jax = self._jax
        w = batch.get("waveform") if isinstance(batch, dict) else None
        if w is None or isinstance(w, np.ndarray):
            return
        try:
            key = (w.shape, str(w.dtype))
            fn = self._consume_fns.get(key)
            if fn is None:
                import jax.numpy as jnp

                fn = jax.jit(
                    lambda a: jnp.sum(jnp.ravel(a)[:8].astype(jnp.float32))
                )
                self._consume_fns[key] = fn
            jax.block_until_ready(fn(w))
        except Exception:
            pass  # never let the warm-path optimisation kill the loader

    def _resolve(self, batch, sharding=None, macro: bool = False):
        """Offset batch (``wave_start`` from the device store) -> regular
        device batch (device_store.resolve_offsets); passthrough otherwise."""
        from .device_store import resolve_offsets

        return resolve_offsets(
            batch, self.store, lambda b: self._put_device(b, sharding),
            macro=macro,
        )

    def _put_device(self, batch, sharding=None):
        jax = self._jax
        sharding = sharding if sharding is not None else self.sharding

        def put(x):
            if isinstance(x, np.ndarray) and x.dtype != object:
                if sharding is not None:
                    from asf_tpu.parallel.mesh import mesh_spans_processes

                    if mesh_spans_processes(sharding.mesh):
                        # Multi-host: this process holds only ITS rank-shard
                        # of the global batch (rank-split loader); assemble a
                        # global array from the per-process slices.
                        return jax.make_array_from_process_local_data(sharding, x)
                    return jax.device_put(x, sharding)
                return jax.device_put(x)
            return x

        return self._jax.tree.map(put, batch)

    @staticmethod
    def _shape_sig(batch):
        return batch_signature(batch)

    def _lr_dev(self, k: int):
        """Upload the next k iterations' LRs here, on the prefetch thread."""
        if self.lr_fn is None:
            self._step_idx += k
            return None
        lrs = np.asarray(
            [self.lr_fn(self._step_idx + i) for i in range(k)], np.float32
        )
        self._step_idx += k
        dev = self._jax.device_put(lrs if k > 1 else lrs[0])
        return dev

    def _emit_group(self, grp):
        if len(grp) == self.group:
            macro = {}
            for k in grp[0]:
                if k == "metadata":
                    continue
                macro[k] = (
                    {kk: np.stack([b[k][kk] for b in grp]) for kk in grp[0][k]}
                    if isinstance(grp[0][k], dict)
                    else np.stack([b[k] for b in grp])
                )
            if self.fuse_store and "wave_start" in macro:
                dev = self._put_device(macro, self.macro_sharding)
            else:
                dev = self._resolve(macro, self.macro_sharding, macro=True)
            self._force_transfer(dev)
            self._qput(("macro", dev, self._lr_dev(len(grp))))
        else:  # remainder: epoch tail or a bucket-shape change
            for b in grp:
                dev = self._resolve(b)
                self._force_transfer(dev)
                self._qput(("single", dev, self._lr_dev(1)))

    def _worker(self):
        try:
            if self.group <= 1:
                for batch in self.it:
                    dev = self._resolve(batch)
                    self._force_transfer(dev)
                    self._qput(("single", dev, self._lr_dev(1)))
            else:
                grp: List[Dict[str, Any]] = []
                for batch in self.it:
                    if grp and self._shape_sig(batch) != self._shape_sig(grp[0]):
                        self._emit_group(grp)
                        grp = []
                    grp.append(batch)
                    if len(grp) == self.group:
                        self._emit_group(grp)
                        grp = []
                if grp:
                    self._emit_group(grp)
        except _PrefetchStopped:
            return  # consumer called stop(); no sentinel needed
        except Exception as e:  # surface worker errors to the consumer
            try:
                self._qput(("error", e, None))
                self._qput(("done", None, None))
            except _PrefetchStopped:
                pass  # consumer stopped while we were reporting — no listener
            return
        self._qput(("done", None, None))

    def __iter__(self):
        while True:
            kind, payload, lr_dev = self.q.get()
            if kind == "done":
                return
            if kind == "error":
                raise payload
            if self.group > 1 or self.lr_fn is not None:
                yield kind, payload, lr_dev  # tagged (kind, batch, lr|None)
            else:
                yield payload


class _PrefetchStopped(Exception):
    pass


def _tree_leaves_with_paths(batch, prefix=""):
    for k, v in batch.items():
        if isinstance(v, dict):
            yield from _tree_leaves_with_paths(v, prefix + k + ".")
        else:
            yield prefix + k, v


def batch_signature(batch) -> tuple:
    """Sorted (path, shape, dtype) over every array leaf of a batch dict.

    THE macro-group compatibility key: batches may be np.stack-ed into one
    scanned dispatch only when signatures match exactly. Shape mismatches
    crash np.stack; dtype mismatches are worse — an int16-PCM batch stacked
    with a same-shape float32 one silently promotes raw PCM to float at
    ~32768x amplitude (the deferred /32768 never fires). Shared by
    DevicePrefetcher, eval_loop._eval_fused and test_loop.perform_test.
    """
    return tuple(
        (path, x.shape, str(x.dtype))
        for path, x in sorted(
            (str(p), l)
            for p, l in _tree_leaves_with_paths(batch)
            if isinstance(l, np.ndarray)
        )
    )

