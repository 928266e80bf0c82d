"""Sliding-window test set over untrimmed EPIC videos.

Parity with /root/reference/audio_slowfast/datasets/epickitchens_slide.py:21-278,
all three modes:
  * whole-video slide: empty records every HOP_SIZE s over every video, then
    back-fill <=4 overlapping verb/noun labels by middle-frame containment
    (:60-199)
  * action-bounds slide (:201-267)
  * per-action-instance (:232-235)
"""

from __future__ import annotations

import datetime
import os

import numpy as np
import pandas as pd

from .build import register_dataset
from .epickitchens import EpicKitchens
from .records import EpicKitchensAudioRecord, timestamp_to_sec
from asf_tpu.utils.logging import get_logger

logger = get_logger(__name__)

MAX_OVERLAP = 4  # empirical max simultaneous annotations (reference :86)


def _ts(seconds: float) -> str:
    return (datetime.datetime.min + datetime.timedelta(seconds=seconds)).strftime(
        "%H:%M:%S.%f"
    )


@register_dataset("EpicKitchensSlide")
class EpicKitchensSlide(EpicKitchens):
    def __init__(self, cfg, mode):
        super().__init__(
            cfg,
            mode,
            record_type=EpicKitchensAudioRecord,
            gru_format=False,
            modes=["test"],
        )

    def _construct_loader(self):
        self.path_annotations_pickle = [
            os.path.join(
                self.cfg.EPICKITCHENS.ANNOTATIONS_DIR,
                self.cfg.EPICKITCHENS.PROCESSED_TEST_LIST,
            )
        ]
        for f in self.path_annotations_pickle:
            assert os.path.exists(f), f"{f} dir not found"

        self._audio_records = []
        self._temporal_idx = []

        slide = self.cfg.TEST.SLIDE
        if not slide.PER_ACTION_INSTANCE and not slide.INSIDE_ACTION_BOUNDS:
            self._construct_loader_whole_video()
        elif slide.INSIDE_ACTION_BOUNDS:
            self._construct_loader_action_bounds(per_instance=slide.PER_ACTION_INSTANCE)
        else:
            raise NotImplementedError("Only whole video mode is supported for now")

    def _construct_loader_whole_video(self):
        cfg = self.cfg
        video_durs = pd.read_csv(
            os.path.join(cfg.EPICKITCHENS.ANNOTATIONS_DIR, cfg.EPICKITCHENS.VIDEO_DURS)
        )

        for file in self.path_annotations_pickle:
            file_df = pd.read_pickle(file)
            file_df = file_df.sort_values(by=["video_id", "start_timestamp", "stop_timestamp"])
            file_df["start_s"] = file_df["start_timestamp"].map(timestamp_to_sec)
            file_df["stop_s"] = file_df["stop_timestamp"].map(timestamp_to_sec)

            durs = video_durs[video_durs["video_id"].isin(file_df["video_id"].unique())]
            durs = durs.reset_index(drop=True)

            for i, video in durs.iterrows():
                start = 0.0
                end = cfg.TEST.SLIDE.WIN_SIZE
                while (start + end) / 2 < video.duration:
                    end = min(end, video.duration)
                    ek_ann = {
                        "video_id": video.video_id,
                        "start_timestamp": _ts(start),
                        "stop_timestamp": _ts(end),
                        "verb_class": np.array([-1] * MAX_OVERLAP),
                        "noun_class": np.array([-1] * MAX_OVERLAP),
                    }
                    if self.unique_batch and len(self._audio_records) >= cfg.TEST.BATCH_SIZE:
                        break
                    self._audio_records.append(
                        EpicKitchensAudioRecord((i, ek_ann), cfg=cfg)
                    )
                    self._temporal_idx.append(0)
                    start += cfg.TEST.SLIDE.HOP_SIZE
                    end = start + cfg.TEST.SLIDE.WIN_SIZE

            assert len(self._audio_records) > 0

            nb_annotations = 0
            # group once: filtering the full DataFrame per window is
            # O(windows x annotations) — ~1e9 row scans for a 1 s-hop slide
            # over EPIC before testing even starts.
            by_video = dict(tuple(file_df.groupby("video_id")))
            for i in range(len(self._audio_records)):
                rec = self._audio_records[i]
                video_id = rec._series["video_id"]
                mid_s = (
                    timestamp_to_sec(rec._series["start_timestamp"])
                    + timestamp_to_sec(rec._series["stop_timestamp"])
                ) / 2
                video_df = by_video.get(video_id)
                assert video_df is not None, f"No annotations for {video_id}"
                video_df = video_df[
                    (video_df["start_s"] <= mid_s) & (mid_s <= video_df["stop_s"])
                ]
                if video_df.shape[0] == 0:
                    continue
                verbs = np.array([video_df["verb_class"].to_numpy()[0]] * MAX_OVERLAP)
                verbs[: video_df.shape[0]] = video_df["verb_class"].to_numpy()[:MAX_OVERLAP]
                nouns = np.array([video_df["noun_class"].to_numpy()[0]] * MAX_OVERLAP)
                nouns[: video_df.shape[0]] = video_df["noun_class"].to_numpy()[:MAX_OVERLAP]
                rec._series["verb_class"] = verbs
                rec._series["noun_class"] = nouns
                rec._series["participant_id"] = video_df["participant_id"].to_numpy()
                nb_annotations += 1

        logger.info(
            "Constructed EpicKitchensSlide whole-video (size %d, %d annotated)",
            len(self._audio_records),
            nb_annotations,
        )

    # -- device segment store protocol: whole-video segments -----------------
    # Whole-video slide windows TILE each video with WIN/HOP overlap, so the
    # parent's per-record segments would store every video ~WIN/HOP times.
    # Store each video ONCE instead, extended by the per-video max window
    # overrun (zero-padded by _read_region, so gathers past the audio end
    # reproduce the host path's zero-pad bit-exactly — never the next
    # segment's bytes). Action-bounds / per-instance modes keep the parent's
    # per-record segments (whole videos could dwarf sparse annotations).
    def _whole_video_mode(self) -> bool:
        s = self.cfg.TEST.SLIDE
        return not s.PER_ACTION_INSTANCE and not s.INSIDE_ACTION_BOUNDS

    def _video_seg_ends(self) -> dict:
        ends = getattr(self, "_seg_ends_cache", None)
        if ends is None:
            ends = {}
            for r in self._audio_records:
                v = r.untrimmed_video_name
                reach = max(
                    int(r.start_audio_sample) + self.clip_samples,
                    int(r.end_audio_sample),
                )
                ends[v] = max(ends.get(v, 0), self._video_len(v), reach)
            self._seg_ends_cache = ends
        return ends

    def device_store_table(self, budget_samples=None):
        if not self._whole_video_mode():
            return super().device_store_table(budget_samples)
        if any(
            getattr(r, "transformation", "none") != "none"
            for r in self._audio_records
        ):
            return None
        return [((v, 0, e), e) for v, e in self._video_seg_ends().items()]

    def get_ref(self, index: int):
        ref = super().get_ref(index)
        if self._whole_video_mode():
            v, a, _b = ref["seg_key"]
            ref["seg_key"] = (v, 0, self._video_seg_ends()[v])
            ref["clip_off"] = int(ref["clip_off"]) + a
        return ref

    # -- vectorized ref batches: whole-video mode stores ONE segment per
    # video, so the inherited per-record keys/offsets remap onto it exactly
    # as get_ref does (seg -> (video, 0, end), off -> off + record start).
    def _slide_ref_remap(self):
        remap = getattr(self, "_slide_remap", None)
        if remap is None:
            reg_keys = super().ref_seg_keys()
            ends = self._video_seg_ends()
            vid_of, vids = {}, []
            video_idx = np.empty((len(reg_keys),), np.int32)
            add_off = np.empty((len(reg_keys),), np.int64)
            for j, (v, a, _b) in enumerate(reg_keys):
                k = vid_of.get(v)
                if k is None:
                    k = vid_of[v] = len(vids)
                    vids.append((v, 0, ends[v]))
                video_idx[j] = k
                add_off[j] = a
            remap = self._slide_remap = (vids, video_idx, add_off)
        return remap

    def ref_seg_keys(self):
        if not self._whole_video_mode():
            return super().ref_seg_keys()
        return self._slide_ref_remap()[0]

    def get_refs_batch(self, indices):
        arrs = super().get_refs_batch(indices)
        if arrs is None or not self._whole_video_mode():
            return arrs
        _vids, video_idx, add_off = self._slide_ref_remap()
        arrs["clip_off"] = arrs["clip_off"] + add_off[arrs["seg_idx"]]
        arrs["seg_idx"] = video_idx[arrs["seg_idx"]]
        return arrs

    def _construct_loader_action_bounds(self, per_instance: bool = False):
        cfg = self.cfg
        for file in self.path_annotations_pickle:
            file_df = pd.read_pickle(file)
            file_df["start_s"] = file_df["start_timestamp"].map(timestamp_to_sec)
            file_df["stop_s"] = file_df["stop_timestamp"].map(timestamp_to_sec)

            it = (
                file_df.iterrows()
                if not self.unique_batch
                else file_df[: cfg.TEST.BATCH_SIZE].iterrows()
            )
            for i, annotation in it:
                if per_instance:
                    self._audio_records.append(
                        EpicKitchensAudioRecord((i, annotation), cfg=cfg)
                    )
                    self._temporal_idx.append(0)
                    continue

                start = annotation["start_s"]
                action_end = annotation["stop_s"]
                end = start + cfg.TEST.SLIDE.WIN_SIZE
                if action_end - start < cfg.TEST.SLIDE.WIN_SIZE:
                    self._audio_records.append(
                        EpicKitchensAudioRecord((i, annotation), cfg=cfg)
                    )
                    self._temporal_idx.append(0)
                    continue
                while (start + end) / 2 <= action_end:
                    end = min(end, action_end)
                    rec = EpicKitchensAudioRecord((i, annotation.copy()), cfg=cfg)
                    rec._series["start_timestamp"] = _ts(start)
                    rec._series["stop_timestamp"] = _ts(end)
                    self._audio_records.append(rec)
                    self._temporal_idx.append(0)
                    start += cfg.TEST.SLIDE.HOP_SIZE
                    end = start + cfg.TEST.SLIDE.WIN_SIZE

        logger.info(
            "Constructed EpicKitchensSlide action-bounds (size %d)", len(self._audio_records)
        )
