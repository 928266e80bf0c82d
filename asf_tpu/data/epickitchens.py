"""EPIC-KITCHENS datasets (HDF5 audio) — waveform-producing, TPU-first.

Parity targets:
  * EpicKitchens (/root/reference/audio_slowfast/datasets/epickitchens.py:23-245)
  * EpicKitchensGRU / WithPDDL / GRUwithPDDL thin registrations
    (/root/reference/audio_slowfast/datasets/epickitchens_{gru,pddl,gru_pddl}.py)
  * clip extraction semantics of pack_audio / pack_audio_gru
    (/root/reference/audio_slowfast/datasets/audio_loader_epic.py:16-156,
     audio_loader_epic_gru.py:13-64)

TPU-first deltas (behaviour-preserving):
  * Items carry fixed-length float32 WAVEFORMS (+ per-item valid-sample
    counts); the log-mel + SpecAugment run on-device inside the jitted step
    (see asf_tpu/dsp) instead of in DataLoader workers.
  * HDF5 is read by REGION (h5py slice) instead of the reference's
    whole-video read per record (audio_loader_epic.py:45 — the known input
    pipeline hazard); GRU window chains read one covering region and slice
    windows from it.
"""

from __future__ import annotations

import os
import threading
from typing import List, Optional, Type

import numpy as np
import pandas as pd

from .build import register_dataset
from .records import (
    AudioRecord,
    EpicKitchensAudioRecord,
    EpicKitchensAudioRecordGRU,
    EpicKitchensAudioRecordGRUwithPDDL,
    EpicKitchensAudioRecordWithPDDL,
)
from .sampling import get_start_end_idx, item_rng
from .transforms import get_transforms
from asf_tpu.utils.logging import get_logger

logger = get_logger(__name__)

# Archive-wide 16-bit-PCM-grid probe verdicts: (path, mtime_ns, size) ->
# {video_id: bool}. See EpicKitchens._probe_int16.
_PCM_GRID_VERDICTS: dict = {}
_PCM_GRID_LOCK = threading.Lock()


@register_dataset("EpicKitchens")
class EpicKitchens:
    def __init__(
        self,
        cfg,
        mode: str,
        record_type: Type[AudioRecord] = EpicKitchensAudioRecord,
        gru_format: bool = False,
        modes: List[str] = ["train", "val", "test", "train+val"],
    ):
        assert mode in modes, f"Split '{mode}' not supported for {type(self).__name__}"
        self.cfg = cfg
        self.mode = mode
        self.record_type = record_type
        self.gru_format = gru_format

        if mode in ["train", "val", "train+val"]:
            self._num_clips = 1
        else:
            self._num_clips = (
                cfg.TEST.NUM_ENSEMBLE_VIEWS if "GRU" not in cfg.TEST.DATASET else 1
            )

        # One h5py handle per worker thread: HDF5 reads on a shared handle
        # are not thread-safe under the loader's thread pool.
        self._h5_local = threading.local()
        self.unique_batch = cfg.EPICKITCHENS.SINGLE_BATCH
        self.transforms = get_transforms()
        self.clip_size = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS))
        self.clip_samples = self.clip_size - 1
        self._epoch = 0
        self.int16 = bool(cfg.TPU.INT16_TRANSFER) if "TPU" in cfg else False
        self._seg_cache = None

        self._construct_loader()
        if self.int16:
            self._probe_int16()
        cache_mb = int(getattr(cfg.TPU, "HOST_WAVEFORM_CACHE_MB", 0)) if "TPU" in cfg else 0
        if cache_mb > 0:
            # The LRU caches whole RECORD segments (record length, not clip
            # length). When the unique-segment working set exceeds the budget,
            # a reshuffled epoch against an over-budget LRU gets near-zero
            # hits, so every miss would pay the segment-sized read
            # AMPLIFICATION (vs the direct clip-sized read) forever — disable
            # instead, like the device store does (device_store.try_build).
            ws = self._cache_working_set_bytes()
            if ws > cache_mb << 20:
                logger.info(
                    "Host waveform cache disabled for %s %s: segment working "
                    "set %.0f MB > TPU.HOST_WAVEFORM_CACHE_MB=%d (an "
                    "over-budget LRU re-reads whole record segments every "
                    "epoch — worse than direct clip reads)",
                    type(self).__name__, self.mode, ws / 2**20, cache_mb,
                )
            else:
                from .cache import ByteLRUCache

                self._seg_cache = ByteLRUCache(cache_mb << 20)

    def set_epoch(self, epoch: int):
        """Re-key the per-item rng stream (DistributedSampler.set_epoch
        semantics for item-level randomness)."""
        self._epoch = int(epoch)

    # -- record list -------------------------------------------------------
    def _annotation_files(self) -> List[str]:
        c = self.cfg.EPICKITCHENS
        if self.mode == "train":
            names = [c.PROCESSED_TRAIN_LIST]
        elif self.mode == "val":
            names = [c.PROCESSED_VAL_LIST]
        elif self.mode == "test":
            names = [c.PROCESSED_TEST_LIST]
        else:  # train+val
            names = [c.PROCESSED_TRAIN_LIST, c.PROCESSED_VAL_LIST]
        return [os.path.join(c.ANNOTATIONS_DIR, n) for n in names]

    def _construct_loader(self):
        files = self._annotation_files()
        for f in files:
            assert os.path.exists(f), f"{f} dir not found"
        self._audio_records = []
        self._temporal_idx = []
        for f in files:
            df = pd.read_pickle(f)
            it = df.iterrows() if not self.unique_batch else df[: self.cfg.TRAIN.BATCH_SIZE].iterrows()
            for tup in it:
                for idx in range(self._num_clips):
                    self._audio_records.append(self.record_type(tup, cfg=self.cfg))
                    self._temporal_idx.append(idx)
        assert len(self._audio_records) > 0, (
            f"Failed to load EPIC-KITCHENS split {self.mode} from {files}"
        )
        logger.info(
            "Constructed %s (size %d) from %s", type(self).__name__, len(self._audio_records), files
        )

    # -- HDF5 access -------------------------------------------------------
    def _h5(self):
        if getattr(self._h5_local, "f", None) is None:
            import h5py

            self._h5_local.f = h5py.File(self.cfg.EPICKITCHENS.AUDIO_DATA_FILE, "r")
        return self._h5_local.f

    def _video_len(self, video_id: str) -> int:
        """Sample count of a video (cached: shape reads are metadata-only but
        per-window lookups add up on the 1-core host)."""
        cache = getattr(self, "_vlen_cache", None)
        if cache is None:
            cache = self._vlen_cache = {}
        n = cache.get(video_id)
        if n is None:
            n = cache[video_id] = int(self._h5()[video_id].shape[0])
        return n

    def _probe_int16(self):
        """Decide the int16-transfer path DATASET-WIDE, not per item (a mixed
        int16/float32 batch stream would flap the jitted step's input dtype —
        see Vggsound._probe_int16 for the compile-thrash rationale).

        The real train/eval loop on this rig is H2D-wire-bound (PROFILE.md
        §2), so shipping raw 16-bit PCM instead of float32 halves the bytes
        per clip and nearly doubles end-to-end loader throughput. The EPIC
        HDF5 (tools/wav_to_hdf5.py; reference src/make_hdf5_dataset.py keeps
        librosa's float32) is int16-transferable when either

          * datasets are stored as int16 directly (wav_to_hdf5 --int16), or
          * the float32 samples all sit exactly on the 16-bit PCM grid
            (v * 32768 integral in [-32768, 32767]) — true when the archive
            came from 16-bit wavs at the native sampling rate.

        Waveform augmentations (annotation column ``transformation``) run on
        the host in float and leave the grid, so any transformed record
        disables the path. The float probe checks a head AND a mid-file chunk
        of EVERY video (16 Ki samples each — ~128 KB/video, one-time at
        dataset construction), so an archive that leaves the 16-bit grid
        mid-file or in a later video is caught, not silently quantized.
        """
        if any(
            getattr(r, "transformation", "none") != "none"
            for r in self._audio_records
        ):
            logger.warning(
                "TPU.INT16_TRANSFER disabled for %s %s: waveform "
                "transformations present (float-domain augmentation leaves "
                "the 16-bit PCM grid)", type(self).__name__, self.mode,
            )
            self.int16 = False
            return
        try:
            f = self._h5()
        except OSError:
            self.int16 = False  # __getitem__ will surface the real IO error
            return
        chunk_len = 16384

        # Per-video verdicts are a property of the ARCHIVE, not the split —
        # cache them module-wide keyed by (path, mtime, size) so the train /
        # val / test constructions of the same file (several per run) pay the
        # ~32 Ki-sample reads per video exactly once per process.
        path = self.cfg.EPICKITCHENS.AUDIO_DATA_FILE
        try:
            st = os.stat(path)
            akey = (os.path.abspath(path), st.st_mtime_ns, st.st_size)
        except OSError:
            akey = (os.path.abspath(path), 0, 0)
        with _PCM_GRID_LOCK:
            verdicts = _PCM_GRID_VERDICTS.setdefault(akey, {})

        def on_grid(samples: np.ndarray) -> bool:
            v = np.asarray(samples, np.float32) * 32768.0
            return bool(
                np.all(v == np.rint(v))
                and (v.size == 0 or (v.min() >= -32768.0 and v.max() <= 32767.0))
            )

        for vid in dict.fromkeys(
            r.untrimmed_video_name for r in self._audio_records
        ):
            dset = f.get(vid)
            if dset is None:
                continue
            if dset.dtype == np.int16:
                continue
            ok = verdicts.get(vid)
            if ok is None:
                n = int(dset.shape[0])
                mid = max(0, n // 2 - chunk_len // 2)
                ok = dset.dtype == np.float32 and on_grid(
                    dset[: min(n, chunk_len)]
                )
                if ok:
                    # Short files (< 3 chunks) have no distinct mid region
                    # after the head — probe the ENTIRE remainder so they are
                    # fully covered; longer files get a mid-file chunk.
                    ok = (
                        on_grid(dset[chunk_len:n])
                        if mid < chunk_len
                        else on_grid(dset[mid : mid + chunk_len])
                    )
                with _PCM_GRID_LOCK:
                    verdicts[vid] = ok
            if not ok:
                logger.warning(
                    "TPU.INT16_TRANSFER disabled for %s %s: %s is %s and not "
                    "on the 16-bit PCM grid", type(self).__name__, self.mode,
                    vid, dset.dtype,
                )
                self.int16 = False
                return

    def _read_region(self, video_id: str, start: int, end: int) -> np.ndarray:
        """Region read with zero-padding outside the video bounds.

        Returns raw int16 PCM when the dataset-wide int16-transfer probe
        passed (the jitted input pipeline applies the /32768 scale on device,
        engine/steps.py make_input_pipeline), else float32.
        """
        dset = self._h5()[video_id]
        n = dset.shape[0]
        a, b = max(0, int(start)), min(n, int(end))
        out = np.zeros(int(end) - int(start), dtype=np.int16 if self.int16 else np.float32)
        if b > a:
            chunk = dset[a:b]
            if self.int16 and chunk.dtype != np.int16:
                # Exact for on-grid values (the probe established head
                # samples are k/32768); clip first so any off-grid outlier
                # the head-only probe missed saturates instead of wrapping
                # through the int16 cast (undefined C truncation).
                chunk = np.clip(
                    chunk.astype(np.float32) * 32768.0, -32768.0, 32767.0
                ).astype(np.int16)
            elif not self.int16 and chunk.dtype == np.int16:
                chunk = chunk.astype(np.float32) / 32768.0
            out[a - int(start) : b - int(start)] = chunk
        return out

    def _cache_working_set_bytes(self) -> int:
        """Total bytes of the unique segments ``_cached_region`` would hold —
        the exact key set the item paths use (record segments for regular
        items, covering chain regions for GRU items)."""
        itemsize = 2 if self.int16 else 4
        segs = set()
        for r in self._audio_records:
            if self.gru_format:
                _nw, a, b = self._gru_region(r)
            else:
                a = int(r.start_audio_sample)
                b = a + max(0, int(r.num_audio_samples))
            segs.add((r.untrimmed_video_name, a, b))
        return sum(b - a for (_v, a, b) in segs) * itemsize

    def _cached_region(self, video_id: str, start: int, end: int) -> np.ndarray:
        """_read_region through the host-RAM segment LRU (data/cache.py).

        Keys are exact (video, start, end) regions, so record-level segment
        reads (deterministic per record) hit on every epoch >= 2; the random
        per-epoch CLIP start is taken by slicing the cached segment. Returned
        arrays are read-only views — callers copy into batch buffers.
        """
        if self._seg_cache is None:
            return self._read_region(video_id, start, end)
        key = (video_id, int(start), int(end))
        arr = self._seg_cache.get(key)
        if arr is None:
            arr = self._read_region(video_id, start, end)
            self._seg_cache.put(key, arr)
        return arr

    # -- item assembly -----------------------------------------------------
    def _clip_for_record(self, record, temporal_sample_index, rng) -> tuple[int, int]:
        """Start sample + number of valid samples for a regular record,
        mirroring pack_audio/_extract_sound_feature case logic."""
        if record.num_audio_samples < self.clip_size:
            # max(0, .) guards degenerate annotations (stop <= start), which
            # would otherwise produce a negative-length region read.
            return record.start_audio_sample, max(0, record.num_audio_samples)
        start_idx, _ = get_start_end_idx(
            record.num_audio_samples,
            self.clip_size,
            temporal_sample_index,
            self.cfg.TEST.NUM_ENSEMBLE_VIEWS,
            start_sample=record.start_audio_sample,
            rng=rng,
        )
        return int(start_idx), self.clip_samples

    def _apply_transform(self, record, wave: np.ndarray, rng) -> np.ndarray:
        name = record.transformation
        if name != "none" and name in self.transforms:
            return np.asarray(
                self.transforms[name](wave, self.cfg.AUDIO_DATA.SAMPLING_RATE, rng=rng),
                np.float32,
            )
        return wave

    def __getitem__(self, index: int):
        rng = item_rng(self.cfg.RNG_SEED, self._epoch, index)
        if self.gru_format:
            return self._get_item_gru(index, rng)
        return self._get_item_regular(index, rng)

    def _get_item_regular(self, index: int, rng):
        record = self._audio_records[index]
        tsi = -1 if self.mode in ["train", "val", "train+val"] else self._temporal_idx[index]
        start, n_valid = self._clip_for_record(record, tsi, rng)
        wave = np.zeros(self.clip_samples, np.int16 if self.int16 else np.float32)
        if self._seg_cache is not None:
            # Cache the whole RECORD segment (epoch-stable key) and slice the
            # random clip window out of it; the clip is always inside the
            # segment (_clip_for_record picks start in
            # [record.start, record.start + num - clip]).
            seg_a = record.start_audio_sample
            seg_b = seg_a + max(0, record.num_audio_samples)
            seg = self._cached_region(record.untrimmed_video_name, seg_a, seg_b)
            region = seg[start - seg_a : start - seg_a + n_valid]
        else:
            region = self._read_region(record.untrimmed_video_name, start, start + n_valid)
        wave[: len(region)] = self._apply_transform(record, region, rng)[: self.clip_samples]
        return {
            "waveform": wave,
            "n_valid": np.int32(n_valid),
            "label": record.label,
            "index": index,
            "metadata": record.metadata,
        }

    # -- device segment store protocol (data/device_store.py) ---------------
    def _gru_region(self, record) -> tuple[int, int, int]:
        """(n_windows, seg_start, region_end) of ``_get_item_gru``'s one
        covering region read — shared by the item path's store refs."""
        sr = self.cfg.AUDIO_DATA.SAMPLING_RATE
        n_windows = min(
            record.num_spectrograms, self.cfg.AUDIO_DATA.MAX_NB_SPECTROGRAMS
        )
        seg_start = record.start_audio_sample
        if record.num_audio_samples < self.clip_size:
            region_end = max(seg_start, record.end_audio_sample)
        else:
            region_end = seg_start + (n_windows - 1) * sr + self.clip_size
        return n_windows, int(seg_start), int(region_end)

    def device_store_table(self, budget_samples=None):
        """Unique ((video, start, end), n_samples) segments, or None when the
        on-device gather path cannot reproduce ``__getitem__`` bit-exactly
        (any record with a host waveform transformation). GRU chains store
        the covering chain region; windows gather as offsets into it."""
        if any(
            getattr(r, "transformation", "none") != "none"
            for r in self._audio_records
        ):
            return None
        segs = {}
        for r in self._audio_records:
            if self.gru_format:
                _nw, a, b = self._gru_region(r)
            else:
                a = int(r.start_audio_sample)
                b = a + max(0, int(r.num_audio_samples))
            segs[(r.untrimmed_video_name, a, b)] = b - a
        return list(segs.items())

    def read_segment(self, key) -> np.ndarray:
        video, a, b = key
        return self._read_region(video, a, b)

    # -- vectorized ref batches (fast_rng bulk sampler) ----------------------
    def ref_seg_keys(self):
        """Unique segment keys in ``get_refs_batch``'s ``seg_idx`` order
        (chain-region keys for GRU format). None when no records exist."""
        if self.gru_format:
            self._build_gru_ref_tables()
            return self._gru_ref_keys
        self._build_ref_tables()
        return self._ref_keys

    def _build_ref_tables(self):
        """Per-index numpy tables for the vectorized ref path (regular
        records only — GRU chains keep the scalar path). Records, labels and
        metadata are epoch-invariant, so one pass at first use amortises all
        the pandas/property traffic out of the per-batch cost."""
        if getattr(self, "_ref_tables", None) is not None:
            return
        key_of, keys = {}, []
        n = len(self._audio_records)
        if n == 0:  # labels/metadata keys are undefined — scalar path only
            self._ref_keys = None
            return
        seg_idx = np.empty((n,), np.int32)
        start_s = np.empty((n,), np.int64)
        num_s = np.empty((n,), np.int64)
        labels = None
        metadata = None
        for i, rec in enumerate(self._audio_records):
            a = int(rec.start_audio_sample)
            nas = int(rec.num_audio_samples)
            key = (rec.untrimmed_video_name, a, a + max(0, nas))
            j = key_of.get(key)
            if j is None:
                j = key_of[key] = len(keys)
                keys.append(key)
            seg_idx[i] = j
            start_s[i] = a
            num_s[i] = nas
            lab, md = rec.label, rec.metadata
            if labels is None:
                labels = {k: [] for k in lab}
                metadata = {k: [] for k in md}
            elif lab.keys() != labels.keys() or md.keys() != metadata.keys():
                raise ValueError(
                    f"record {i} label/metadata keys differ from record 0 — "
                    "heterogeneous records cannot batch (collate assumes one "
                    "schema per dataset)"
                )
            for k, v in lab.items():
                labels[k].append(np.asarray(v))
            for k, v in md.items():
                metadata[k].append(v)
        labels = {k: np.asarray(np.stack(v)) for k, v in labels.items()}
        self._ref_keys = keys
        self._ref_tables = (
            seg_idx, start_s, num_s,
            np.asarray(self._temporal_idx, np.int64), labels, metadata,
        )

    def _build_gru_ref_tables(self):
        """Per-index numpy tables for the GRU-chain vectorized ref path.

        Chain window placement is fully DETERMINISTIC given the record
        (windows advance by 1 s of samples — pack_audio_gru,
        /root/reference/audio_slowfast/datasets/audio_loader_epic_gru.py:47 —
        no rng at all), so the whole per-item cost of ``_get_ref_gru`` is
        record-property/pandas traffic that one table pass amortises away
        (VERDICT r4 next-step #3)."""
        if getattr(self, "_gru_ref_tables", None) is not None:
            return
        n = len(self._audio_records)
        if n == 0:
            self._gru_ref_keys = None
            return
        key_of, keys = {}, []
        seg_idx = np.empty((n,), np.int32)
        seg_start = np.empty((n,), np.int64)
        num_s = np.empty((n,), np.int64)
        n_windows = np.empty((n,), np.int32)
        vid_len = np.empty((n,), np.int64)
        labels = None
        metadata = None
        embeddings = None
        vid_len_of = {}
        for i, rec in enumerate(self._audio_records):
            nw, a, b = self._gru_region(rec)
            key = (rec.untrimmed_video_name, a, b)
            j = key_of.get(key)
            if j is None:
                j = key_of[key] = len(keys)
                keys.append(key)
            seg_idx[i] = j
            seg_start[i] = a
            num_s[i] = int(rec.num_audio_samples)
            n_windows[i] = nw
            vl = vid_len_of.get(rec.untrimmed_video_name)
            if vl is None:
                vl = vid_len_of[rec.untrimmed_video_name] = self._video_len(
                    rec.untrimmed_video_name
                )
            vid_len[i] = vl
            lab, md = rec.label, rec.metadata
            if labels is None:
                labels = {k: [] for k in lab}
                metadata = {k: [] for k in md}
            elif lab.keys() != labels.keys() or md.keys() != metadata.keys():
                raise ValueError(
                    f"record {i} label/metadata keys differ from record 0 — "
                    "heterogeneous records cannot batch (collate assumes one "
                    "schema per dataset)"
                )
            for k, v in lab.items():
                labels[k].append(np.asarray(v))
            for k, v in md.items():
                metadata[k].append(v)
            if isinstance(rec, EpicKitchensAudioRecordGRU):
                emb = rec.noun_embedding
                if embeddings is None:
                    embeddings = np.zeros((n, 512), np.float32)
                if emb.size:
                    embeddings[i] = emb.astype(np.float32)
        labels = {k: np.asarray(np.stack(v)) for k, v in labels.items()}
        self._gru_ref_keys = keys
        self._gru_ref_tables = (
            seg_idx, seg_start, num_s, n_windows, vid_len,
            labels, metadata, embeddings,
        )

    def _get_refs_batch_gru(self, indices: np.ndarray):
        """Vectorized ``_get_ref_gru`` over a batch: (B, NB) window-offset /
        n_valid grids at full MAX_NB_SPECTROGRAMS width, padding windows and
        degenerate empty chunks marked ``off < 0`` (the loader maps them to
        the mega-buffer's zero pad; tests/test_fast_rng.py asserts
        bit-identity with ``collate_refs(pool.map(get_ref, ...))``)."""
        self._build_gru_ref_tables()
        if self._gru_ref_keys is None:
            return None
        (seg_idx, seg_start, num_s, n_windows, vid_len,
         labels, metadata, embeddings) = self._gru_ref_tables
        indices = np.asarray(indices, np.int64)
        nb_full = int(self.cfg.AUDIO_DATA.MAX_NB_SPECTROGRAMS)
        sr = self.cfg.AUDIO_DATA.SAMPLING_RATE
        nw = n_windows[indices][:, None].astype(np.int64)      # (B, 1)
        nas = num_s[indices][:, None]                          # (B, 1)
        a = seg_start[indices][:, None]
        vl = vid_len[indices][:, None]
        w = np.arange(nb_full, dtype=np.int64)[None, :]        # (1, NB)
        short = nas < self.clip_size
        chunk_len = np.where(short, np.maximum(0, nas), self.clip_samples)
        offs = np.where(short, 0, w * sr)                      # (B, NB)
        start_i = a + offs
        in_video = np.maximum(0, np.minimum(start_i + chunk_len, vl) - start_i)
        n_valid = np.maximum(1, np.minimum(chunk_len, in_video)).astype(np.int32)
        dead = (chunk_len == 0) | (w >= nw)  # empty chunks + bucket padding
        offs = np.where(dead, -1, offs)
        n_valid = np.where(dead, np.int32(1), n_valid)
        out = {
            "seg_idx": seg_idx[indices],
            "window_offs": offs,
            "n_valid": n_valid,
            "lengths": n_windows[indices],
            "labels": {k: v[indices] for k, v in labels.items()},
            "index": indices,
            "metadata": {
                k: [v[i] for i in indices] for k, v in metadata.items()
            },
        }
        if embeddings is not None:
            out["noun_embedding"] = embeddings[indices]
        return out

    def get_refs_batch(self, indices: np.ndarray):
        """Vectorized ``get_ref`` over a batch — the identical clip placement
        (fast_rng replays ``item_rng(...).uniform`` bit-exactly; the
        float64 ``a + u`` sum and its floor are computed exactly as
        ``get_start_end_idx``/``_clip_for_record`` do; GRU chains are
        deterministic offset grids) without per-item Python. None -> scalar
        fallback (empty record list, exotic seed/epoch)."""
        if self.gru_format:
            return self._get_refs_batch_gru(indices)
        if not (0 <= int(self.cfg.RNG_SEED) < 2**32 and 0 <= self._epoch < 2**32):
            return None
        from .fast_rng import bulk_first_uniform

        self._build_ref_tables()
        if getattr(self, "_ref_tables", None) is None:
            return None
        seg_idx, start_s, num_s, temporal_idx, labels, metadata = self._ref_tables
        indices = np.asarray(indices, np.int64)
        a = start_s[indices]
        nas = num_s[indices]
        off = np.zeros((len(indices),), np.int64)
        n_valid = np.maximum(0, nas).astype(np.int32)
        sampled = nas >= self.clip_size
        if np.any(sampled):
            delta = (nas[sampled] - self.clip_size).astype(np.float64)
            if self.mode in ["train", "val", "train+val"]:
                u = bulk_first_uniform(
                    self.cfg.RNG_SEED, self._epoch, indices[sampled], delta
                )
            else:  # linspace(0, delta, num)[tsi], matching np.linspace exactly
                nc = int(self.cfg.TEST.NUM_ENSEMBLE_VIEWS)
                tsi = temporal_idx[indices][sampled]
                if nc == 1:
                    u = np.zeros_like(delta)
                else:
                    u = tsi.astype(np.float64) * (delta / (nc - 1))
                    u[tsi == nc - 1] = delta[tsi == nc - 1]
            # int(a + u) - a, with the sum rounded in float64 first — exactly
            # the scalar path's arithmetic (a can be large enough that
            # floor(a + u) != a + floor(u)).
            off[sampled] = (
                np.floor(a[sampled].astype(np.float64) + u).astype(np.int64)
                - a[sampled]
            )
            n_valid[sampled] = self.clip_samples
        return {
            "seg_idx": seg_idx[indices],
            "clip_off": off,
            "n_valid": n_valid,
            "labels": {k: v[indices] for k, v in labels.items()},
            "index": indices,
            "metadata": {
                k: [v[i] for i in indices] for k, v in metadata.items()
            },
        }

    def get_ref(self, index: int):
        """The metadata of ``__getitem__`` WITHOUT reading audio: segment key
        + clip offset + n_valid. Consumes the identical per-item rng stream
        as ``_get_item_regular`` so the on-device gather of the stored
        segment yields the bit-identical clip."""
        if self.gru_format:
            return self._get_ref_gru(index)
        rng = item_rng(self.cfg.RNG_SEED, self._epoch, index)
        record = self._audio_records[index]
        tsi = -1 if self.mode in ["train", "val", "train+val"] else self._temporal_idx[index]
        start, n_valid = self._clip_for_record(record, tsi, rng)
        a = int(record.start_audio_sample)
        return {
            "seg_key": (
                record.untrimmed_video_name, a, a + max(0, int(record.num_audio_samples))
            ),
            "clip_off": int(start) - a,
            "n_valid": np.int32(n_valid),
            "label": record.label,
            "index": index,
            "metadata": record.metadata,
        }

    def _get_ref_gru(self, index: int):
        """``_get_item_gru``'s window placement without reading audio:
        per-window offsets INTO the stored chain region + the same
        in-video n_valid rule. ``window_offs < 0`` marks degenerate empty
        chunks (stop <= start annotations), which the host path leaves as
        all-zero rows with n_valid=1 — collate_refs points them at the
        mega-buffer's zero pad so the gather reproduces that bit-exactly."""
        record = self._audio_records[index]
        sr = self.cfg.AUDIO_DATA.SAMPLING_RATE
        n_windows, seg_start, region_end = self._gru_region(record)
        vid_len = self._video_len(record.untrimmed_video_name)
        short = record.num_audio_samples < self.clip_size

        offs = np.zeros((n_windows,), np.int32)
        n_valid = np.zeros((n_windows,), np.int32)
        for i in range(n_windows):
            if short:
                off, chunk_len = 0, max(0, int(record.num_audio_samples))
            else:
                off, chunk_len = i * sr, self.clip_samples
            if chunk_len == 0:
                offs[i], n_valid[i] = -1, 1  # zero-pad sentinel
                continue
            start_i = seg_start + off
            in_video = max(0, min(start_i + chunk_len, vid_len) - start_i)
            offs[i] = off
            n_valid[i] = max(1, min(chunk_len, in_video))

        ref = {
            "seg_key": (record.untrimmed_video_name, seg_start, region_end),
            "window_offs": offs,
            "n_valid": n_valid,
            "length": np.int32(n_windows),
            "label": record.label,
            "index": index,
            "metadata": record.metadata,
        }
        if isinstance(record, EpicKitchensAudioRecordGRU):
            emb = record.noun_embedding
            ref["noun_embedding"] = (
                emb.astype(np.float32) if emb.size else np.zeros(512, np.float32)
            )
        return ref

    def _get_item_gru(self, index: int, rng):
        record = self._audio_records[index]
        sr = self.cfg.AUDIO_DATA.SAMPLING_RATE
        n_windows = min(record.num_spectrograms, self.cfg.AUDIO_DATA.MAX_NB_SPECTROGRAMS)

        # One covering region read; windows are slices of it.
        # Window i starts at record.start + i * sr (pack_audio_gru:47 — the
        # reference advances windows by 1 s per index, NOT by clip - overlap).
        seg_start = record.start_audio_sample
        if record.num_audio_samples < self.clip_size:
            # max(seg_start, .): degenerate annotations (stop <= start) exist
            # in real data — same guard as _clip_for_record's regular path.
            region_end = max(seg_start, record.end_audio_sample)
        else:
            region_end = seg_start + (n_windows - 1) * sr + self.clip_size
        region = self._cached_region(record.untrimmed_video_name, seg_start, region_end)
        vid_len = self._video_len(record.untrimmed_video_name)

        waves = np.zeros(
            (n_windows, self.clip_samples), np.int16 if self.int16 else np.float32
        )
        n_valid = np.zeros((n_windows,), np.int32)
        for i in range(n_windows):
            if record.num_audio_samples < self.clip_size:
                # whole (short) segment for every window (case 1)
                chunk = region[: max(0, record.num_audio_samples)]
                start_i = seg_start
            else:
                off = i * sr
                chunk = region[off : off + self.clip_samples]
                start_i = seg_start + off
            chunk = self._apply_transform(record, chunk, rng)[: self.clip_samples]
            waves[i, : len(chunk)] = chunk
            # Valid samples = the part actually inside the video. The
            # reference's numpy slice samples[start:end] TRUNCATES at the
            # video end (audio_loader_epic.py _extract_sound_feature) and
            # edge-pads the short spectrogram; counting _read_region's
            # zero-pad as valid would instead spectrogram literal zeros.
            # min 1 keeps the on-device edge-gather well-defined (same
            # convention as collate's padded windows).
            in_video = max(0, min(start_i + len(chunk), vid_len) - start_i)
            n_valid[i] = max(1, min(len(chunk), in_video))

        item = {
            "waveform": waves,
            "n_valid": n_valid,
            "length": np.int32(n_windows),
            "label": record.label,
            "index": index,
            "metadata": record.metadata,
        }
        if isinstance(record, EpicKitchensAudioRecordGRU):
            emb = record.noun_embedding
            item["noun_embedding"] = (
                emb.astype(np.float32) if emb.size else np.zeros(512, np.float32)
            )
        return item

    def __len__(self):
        return len(self._audio_records)


@register_dataset("EpicKitchensGRU")
class EpicKitchensGRU(EpicKitchens):
    """Parity: datasets/epickitchens_gru.py:8-20."""

    def __init__(self, cfg, mode):
        super().__init__(
            cfg, mode, record_type=EpicKitchensAudioRecordGRU, gru_format=True
        )


@register_dataset("EpicKitchensWithPDDL")
class EpicKitchensWithPDDL(EpicKitchens):
    """Parity: datasets/epickitchens_pddl.py:10-22."""

    def __init__(self, cfg, mode):
        super().__init__(
            cfg, mode, record_type=EpicKitchensAudioRecordWithPDDL, gru_format=False
        )


@register_dataset("EpicKitchensGRUwithPDDL")
class EpicKitchensGRUwithPDDL(EpicKitchens):
    """Parity: datasets/epickitchens_gru_pddl.py:10-22."""

    def __init__(self, cfg, mode):
        super().__init__(
            cfg, mode, record_type=EpicKitchensAudioRecordGRUwithPDDL, gru_format=True
        )
