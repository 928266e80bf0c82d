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

Scope guards (``try_build`` returns None and the loop streams as before):
  * datasets must offer the ref protocol (``device_store_table`` /
    ``get_ref`` / ``read_segment`` — EpicKitchens family, non-GRU modes);
  * any record with a host-side waveform transformation disables the store
    (augmentation must see float samples on the host);
  * total segment bytes must fit ``TPU.TRAIN_DEVICE_CACHE_MB``;
  * multi-host meshes stream (per-process assembly of gathered global
    arrays is not implemented).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from asf_tpu.utils.logging import get_logger

logger = get_logger(__name__)


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
        if mesh is not None:
            from asf_tpu.parallel.mesh import replicated

            self._mega = jax.device_put(mega_np, replicated(mesh))
        else:
            self._mega = jax.device_put(mega_np)
        self._gather_single = None
        self._gather_macro = None

    # -- build ---------------------------------------------------------------
    @classmethod
    def try_build(cls, dataset, budget_bytes: int, mesh=None) -> Optional["DeviceSegmentStore"]:
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
                "ref/gather path here (GRU chains, host waveform transforms, "
                "or the set exceeds the budget)", type(dataset).__name__,
            )
            return None
        if mesh is not None:
            from asf_tpu.parallel.mesh import mesh_spans_processes

            if mesh_spans_processes(mesh):
                logger.info(
                    "Device segment store disabled: mesh spans processes"
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

    def _make_gather(self, macro: bool):
        import jax
        import jax.numpy as jnp

        S = self.clip_samples
        iota = np.arange(S, dtype=np.int32)

        def one(mega, s, nv):
            w = jax.lax.dynamic_slice(mega, (s,), (S,))
            return jnp.where(jnp.asarray(iota) < nv, w, jnp.zeros((), w.dtype))

        def fn(mega, starts, n_valid):
            f = jax.vmap(one, in_axes=(None, 0, 0))
            if macro:
                f = jax.vmap(f, in_axes=(None, 0, 0))
            return f(mega, starts, n_valid)

        if self.mesh is not None:
            from asf_tpu.parallel.mesh import batch_sharding, macro_batch_sharding

            out = macro_batch_sharding(self.mesh) if macro else batch_sharding(self.mesh)
            return jax.jit(fn, out_shardings=out)
        return jax.jit(fn)

    def gather(self, starts: np.ndarray, n_valid: np.ndarray, macro: bool):
        """(B,)/(K,B) int32 clip offsets -> (B,S)/(K,B,S) device waveforms.

        Bit-identical to the host assembly: samples past ``n_valid`` are
        zeroed exactly as the host's zero-initialised clip buffers were.
        """
        if macro:
            if self._gather_macro is None:
                self._gather_macro = self._make_gather(True)
            g = self._gather_macro
        else:
            if self._gather_single is None:
                self._gather_single = self._make_gather(False)
            g = self._gather_single
        return g(
            self._mega,
            np.asarray(starts, np.int32),
            np.asarray(n_valid, np.int32),
        )


def collate_refs(items, store: DeviceSegmentStore):
    """Collate ref items (``dataset.get_ref``) into an offset batch.

    Mirrors ``loader.collate`` for every non-waveform field; the waveform is
    represented by ``wave_start`` (absolute int32 offsets into the store's
    mega-buffer), resolved to a real device array by the prefetcher's
    ``store.gather`` call.
    """
    out = {
        "wave_start": np.asarray(
            [store.base(it["seg_key"]) + int(it["clip_off"]) for it in items],
            np.int32,
        ),
        "n_valid": np.asarray([it["n_valid"] for it in items], np.int32),
    }
    first = items[0]
    out["labels"] = {
        k: np.asarray(np.stack([np.asarray(it["label"][k]) for it in items]))
        for k in first["label"].keys()
    }
    out["index"] = np.asarray([it["index"] for it in items], np.int64)
    out["metadata"] = {
        k: [it["metadata"][k] for it in items] for k in first["metadata"].keys()
    }
    return out
