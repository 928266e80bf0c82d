"""Audio record types — lazy views over annotation rows.

Parity targets:
  * AudioRecord + timestamp_to_sec (/root/reference/audio_slowfast/datasets/audio_record.py:5-44)
  * EpicKitchensAudioRecord (/root/reference/audio_slowfast/datasets/epickitchens_record.py:9-51)
  * GRU variant with num_spectrograms / noun_embedding
    (/root/reference/audio_slowfast/datasets/epickitchens_record_gru.py:8-77)
  * PDDL variants adding precs_vec / posts_vec labels
    (/root/reference/audio_slowfast/datasets/epickitchens_record_pddl.py:44-51,
     /root/reference/audio_slowfast/datasets/epickitchens_record_gru_pddl.py:75-87)
"""

from __future__ import annotations

import time
from datetime import timedelta

import numpy as np


def timestamp_to_sec(timestamp: str) -> float:
    """Parse 'HH:MM:SS.ff' to seconds.

    Parity with datasets/utils.py:115-139 (the robust variant that handles
    variable-length fractional parts).
    """
    time_parts = timestamp.split(".")
    base_time = time_parts[0]
    frac = time_parts[1].rstrip("0") if len(time_parts) > 1 else "0"
    if not frac:
        frac = "0"
    x = time.strptime(base_time, "%H:%M:%S")
    sec = float(
        timedelta(hours=x.tm_hour, minutes=x.tm_min, seconds=x.tm_sec).total_seconds()
    )
    return sec + int(frac) / (10 ** len(frac))


class AudioRecord:
    def __init__(self, tup, cfg):
        self.cfg = cfg
        self._index = str(tup[0])
        self._series = tup[1]
        self._sampling_rate = cfg.AUDIO_DATA.SAMPLING_RATE

    @property
    def participant(self):
        return self._series["participant_id"]

    @property
    def untrimmed_video_name(self):
        return self._series["video_id"]

    @property
    def start_audio_sample(self) -> int:
        return int(round(timestamp_to_sec(self._series["start_timestamp"]) * self._sampling_rate))

    @property
    def end_audio_sample(self) -> int:
        return int(round(timestamp_to_sec(self._series["stop_timestamp"]) * self._sampling_rate))

    @property
    def num_audio_samples(self) -> int:
        return self.end_audio_sample - self.start_audio_sample

    @property
    def transformation(self) -> str:
        return self._series["transformation"] if "transformation" in self._series else "none"

    @property
    def label(self):
        raise NotImplementedError

    @property
    def metadata(self):
        return {"narration_id": self._index}


class EpicKitchensAudioRecord(AudioRecord):
    @property
    def label(self):
        return {
            "verb": self._series["verb_class"],
            "noun": self._series["noun_class"],
        }


class EpicKitchensAudioRecordGRU(AudioRecord):
    def __init__(self, tup, cfg):
        super().__init__(tup, cfg)
        self._spectrogram_overlap = cfg.AUDIO_DATA.SPECTROGRAM_OVERLAP

    @property
    def length_in_s(self) -> float:
        return self.num_audio_samples / self._sampling_rate

    @property
    def num_spectrograms(self) -> int:
        """ceil((len - overlap) / (clip - overlap)), at least 1
        (epickitchens_record_gru.py:46-61)."""
        return int(
            np.ceil(
                max(
                    (self.length_in_s - self._spectrogram_overlap)
                    / (self.cfg.AUDIO_DATA.CLIP_SECS - self._spectrogram_overlap),
                    1,
                )
            )
        )

    @property
    def label(self):
        return {
            "verb": self._series["verb_class"],
            "noun": self._series["noun_class"],
        }

    @property
    def noun_embedding(self) -> np.ndarray:
        if "noun_embedding" in self._series:
            return np.asarray(self._series["noun_embedding"]).reshape(-1)
        return np.array([])


class EpicKitchensAudioRecordWithPDDL(EpicKitchensAudioRecord):
    @property
    def label(self):
        return {
            "verb": self._series["verb_class"],
            "noun": self._series["noun_class"],
            "precs": np.asarray(self._series["precs_vec"], np.float32),
            "posts": np.asarray(self._series["posts_vec"], np.float32),
        }


class EpicKitchensAudioRecordGRUwithPDDL(EpicKitchensAudioRecordGRU):
    @property
    def label(self):
        return {
            "verb": self._series["verb_class"],
            "noun": self._series["noun_class"],
            "precs": np.asarray(self._series["precs_vec"], np.float32),
            "posts": np.asarray(self._series["posts_vec"], np.float32),
        }
