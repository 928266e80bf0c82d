"""VGG-Sound dataset (per-clip .wav files).

Parity with /root/reference/audio_slowfast/datasets/vggsound.py:14-97 and
audio_loader_vggsound.py:39-85 (own get_start_end_idx without start_sample).
Wav decoding uses scipy.io.wavfile with int16 -> float32/32768 scaling —
identical to librosa.core.load(sr=None) on 16-bit PCM.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from .build import register_dataset
from .sampling import get_start_end_idx, item_rng
from asf_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def load_wav(path: str, keep_int16: bool = False) -> tuple[np.ndarray, int]:
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        if keep_int16 and data.ndim == 1:
            # int16 transfer path: the device input pipeline applies the
            # identical /32768 scale (engine/steps.py make_input_pipeline),
            # halving host copy + H2D bytes on the way there.
            return data, sr
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:  # librosa mono=False keeps channels; reference audio is mono
        data = data.mean(axis=1)
    return data, sr


@register_dataset("Vggsound")
class Vggsound:
    def __init__(self, cfg, mode: str):
        assert mode in ["train", "val", "test"], f"Split '{mode}' not supported for VGG-Sound"
        self.cfg = cfg
        self.mode = mode
        self._num_clips = cfg.TEST.NUM_ENSEMBLE_VIEWS if mode == "test" else 1
        self.clip_size = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS))
        self.clip_samples = self.clip_size - 1
        self.int16 = bool(cfg.TPU.INT16_TRANSFER) if "TPU" in cfg else False
        self._epoch = 0
        self._construct_loader()

    def set_epoch(self, epoch: int):
        self._epoch = int(epoch)

    def _construct_loader(self):
        c = self.cfg.VGGSOUND
        name = {"train": c.TRAIN_LIST, "val": c.VAL_LIST, "test": c.TEST_LIST}[self.mode]
        path = os.path.join(c.ANNOTATIONS_DIR, name)
        assert os.path.exists(path), f"{path} dir not found"
        self._audio_records = []
        self._temporal_idx = []
        for _, row in pd.read_pickle(path).iterrows():
            for idx in range(self._num_clips):
                self._audio_records.append(row)
                self._temporal_idx.append(idx)
        assert len(self._audio_records) > 0, (
            f"Failed to load VGG-Sound split {self.mode} from {path}"
        )
        logger.info("Constructed Vggsound %s (size %d)", self.mode, len(self._audio_records))
        if self.int16:
            self._probe_int16()

    def _probe_int16(self):
        """Decide the int16-transfer path DATASET-WIDE, not per file.

        A file that is not mono int16 PCM falls back to scaled float32; if a
        batch then mixed raw-PCM and float rows, collate's stack would need
        per-row rescaling and the batch dtype would flap between int16 and
        float32 across batches — each flap is a separate jit compile of the
        scanned train step (minutes on TPU). Probe a sample of files up
        front: any non-conforming file disables int16 for the whole dataset
        (collate additionally rescues genuinely mixed batches)."""
        from scipy.io import wavfile

        seen, probed = set(), 0
        for rec in self._audio_records:
            if probed >= 8:
                break
            name = rec["video"][:-4] + ".wav"
            if name in seen:
                continue
            seen.add(name)
            path = os.path.join(self.cfg.VGGSOUND.AUDIO_DATA_DIR, name)
            try:
                _, data = wavfile.read(path, mmap=True)
            except (FileNotFoundError, ValueError):
                continue  # __getitem__ will surface real IO errors
            probed += 1  # only successfully READ files count toward the cap
            if data.dtype != np.int16 or data.ndim != 1:
                logger.warning(
                    "TPU.INT16_TRANSFER disabled for Vggsound %s: %s is %s/%dD "
                    "(need mono int16 PCM dataset-wide)",
                    self.mode, name, data.dtype, data.ndim,
                )
                self.int16 = False
                return

    # -- device segment store protocol (data/device_store.py) ---------------
    def _wav_name(self, record) -> str:
        return record["video"][:-4] + ".wav"

    def _file_len(self, name: str) -> int:
        """Frame count from the wav header (mmap read, no data touched);
        channel-mean in load_wav preserves the frame count. Also enforces
        ``__getitem__``'s sampling-rate assertion here so the device-store
        path (which never calls ``__getitem__``) cannot silently train on
        wrong-rate files."""
        cache = getattr(self, "_flen_cache", None)
        if cache is None:
            cache = self._flen_cache = {}
        n = cache.get(name)
        if n is None:
            from scipy.io import wavfile

            sr, data = wavfile.read(
                os.path.join(self.cfg.VGGSOUND.AUDIO_DATA_DIR, name), mmap=True
            )
            assert sr == self.cfg.AUDIO_DATA.SAMPLING_RATE, (
                f"Audio sampling rate ({sr}) does not match target "
                f"({self.cfg.AUDIO_DATA.SAMPLING_RATE})"
            )
            n = cache[name] = int(data.shape[0])
        return n

    def device_store_table(self, budget_samples=None):
        """Unique (wav name, n_samples) entries; early-aborts (None) once the
        cumulative sample count exceeds ``budget_samples`` so huge sets don't
        pay a full header sweep before the budget check rejects them anyway."""
        out, total = {}, 0
        for rec in self._audio_records:
            name = self._wav_name(rec)
            if name in out:
                continue
            try:
                n = self._file_len(name)
            except (FileNotFoundError, ValueError):
                return None  # __getitem__ will surface the real IO error
            out[name] = n
            total += n
            if budget_samples is not None and total > budget_samples:
                logger.info(
                    "Device segment store: Vggsound %s exceeds the sample "
                    "budget after %d files — streaming", self.mode, len(out),
                )
                return None
        return list(out.items())

    def read_segment(self, name: str) -> np.ndarray:
        samples, sr = load_wav(
            os.path.join(self.cfg.VGGSOUND.AUDIO_DATA_DIR, name),
            keep_int16=self.int16,
        )
        assert sr == self.cfg.AUDIO_DATA.SAMPLING_RATE, (
            f"Audio sampling rate ({sr}) does not match target "
            f"({self.cfg.AUDIO_DATA.SAMPLING_RATE})"
        )
        return samples

    # -- vectorized ref batches (fast_rng bulk sampler) ----------------------
    def ref_seg_keys(self) -> list:
        """Unique segment keys in the order ``get_refs_batch``'s ``seg_idx``
        refers to (built together with the per-index tables)."""
        self._build_ref_tables()
        return self._ref_keys

    def _build_ref_tables(self):
        if getattr(self, "_ref_tables", None) is not None:
            return
        key_of, keys = {}, []
        n = len(self._audio_records)
        seg_idx = np.empty((n,), np.int32)
        class_id = np.empty((n,), np.int64)
        for i, rec in enumerate(self._audio_records):
            name = self._wav_name(rec)
            j = key_of.get(name)
            if j is None:
                j = key_of[name] = len(keys)
                keys.append(name)
            seg_idx[i] = j
            class_id[i] = rec["class_id"]
        n_samples = np.asarray([self._file_len(k) for k in keys], np.int64)
        self._ref_keys = keys
        self._ref_tables = (seg_idx, class_id, n_samples,
                            np.asarray(self._temporal_idx, np.int64))

    def get_refs_batch(self, indices: np.ndarray):
        """Vectorized ``get_ref`` over a batch of indices — identical clip
        placement (fast_rng replays the per-item Generator draws bit-exactly)
        without the ~45 µs/item SeedSequence+Generator construction or the
        per-item dict/pandas traffic. Returns the arrays ``AsfLoader``
        collates into an offset batch, or None to fall back to the scalar
        path (seed/epoch outside the vectorizable range)."""
        from .fast_rng import bulk_first_uniform

        if not (0 <= int(self.cfg.RNG_SEED) < 2**32 and 0 <= self._epoch < 2**32):
            return None
        self._build_ref_tables()
        seg_idx, class_id, n_samples, temporal_idx = self._ref_tables
        indices = np.asarray(indices, np.int64)
        si = seg_idx[indices]
        ns = n_samples[si]
        off = np.zeros((len(indices),), np.int64)
        n_valid = np.minimum(ns, self.clip_samples).astype(np.int32)
        sampled = ns >= self.clip_size
        if np.any(sampled):
            ns_s = ns[sampled].astype(np.float64)
            delta = ns_s - self.clip_size
            if self.mode in ["train", "val"]:
                start = bulk_first_uniform(
                    self.cfg.RNG_SEED, self._epoch, indices[sampled], delta
                )
            else:  # linspace(0, delta, num)[tsi], matching np.linspace exactly
                nc = int(self._num_clips)
                tsi = temporal_idx[indices][sampled]
                if nc == 1:
                    start = np.zeros_like(delta)
                else:
                    start = tsi.astype(np.float64) * (delta / (nc - 1))
                    start[tsi == nc - 1] = delta[tsi == nc - 1]
            end = start + (self.clip_size - 1)
            off[sampled] = np.floor(start).astype(np.int64)
            n_valid[sampled] = np.minimum(
                np.floor(end) - np.floor(start), self.clip_samples
            ).astype(np.int32)
        return {
            "seg_idx": si,
            "clip_off": off,
            "n_valid": n_valid,
            "labels": {"class_id": class_id[indices]},
            "index": indices,
            "metadata": {},
        }

    def get_ref(self, index: int):
        """``__getitem__``'s clip placement without decoding audio: same rng
        derivation, same short-file clamp — the store gather of the decoded
        file reproduces the item bit-exactly."""
        record = self._audio_records[index]
        tsi = -1 if self.mode in ["train", "val"] else self._temporal_idx[index]
        name = self._wav_name(record)
        n_samples = self._file_len(name)
        if n_samples < self.clip_size:
            off, n_valid = 0, min(n_samples, self.clip_samples)
        else:
            start, end = get_start_end_idx(
                n_samples, self.clip_size, tsi, self.cfg.TEST.NUM_ENSEMBLE_VIEWS,
                rng=item_rng(self.cfg.RNG_SEED, self._epoch, index),
            )
            off = int(start)
            n_valid = min(int(end) - int(start), self.clip_samples)
        return {
            "seg_key": name,
            "clip_off": off,
            "n_valid": np.int32(n_valid),
            "label": {"class_id": record["class_id"]},
            "index": index,
            "metadata": {},
        }

    def __getitem__(self, index: int):
        record = self._audio_records[index]
        tsi = -1 if self.mode in ["train", "val"] else self._temporal_idx[index]

        path = os.path.join(
            self.cfg.VGGSOUND.AUDIO_DATA_DIR, record["video"][:-4] + ".wav"
        )
        samples, sr = load_wav(path, keep_int16=self.int16)
        assert sr == self.cfg.AUDIO_DATA.SAMPLING_RATE, (
            f"Audio sampling rate ({sr}) does not match target "
            f"({self.cfg.AUDIO_DATA.SAMPLING_RATE})"
        )

        if len(samples) < self.clip_size:
            clip = samples
        else:
            start, end = get_start_end_idx(
                len(samples), self.clip_size, tsi, self.cfg.TEST.NUM_ENSEMBLE_VIEWS,
                rng=item_rng(self.cfg.RNG_SEED, self._epoch, index),
            )
            clip = samples[int(start) : int(end)]

        wave = np.zeros(self.clip_samples, samples.dtype)
        n = min(len(clip), self.clip_samples)
        wave[:n] = clip[:n]
        return {
            "waveform": wave,
            "n_valid": np.int32(n),
            "label": {"class_id": record["class_id"]},
            "index": index,
            "metadata": {},
        }

    def __len__(self):
        return len(self._audio_records)
