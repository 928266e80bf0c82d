"""Synthetic dataset fixtures: tiny HDF5 + annotation pickles + wavs.

The reference has no hermetic fixtures (its tests need the real EPIC HDF5 —
SURVEY.md §4); these synthesize the same schemas so the data pipeline is
testable anywhere.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def _ts(seconds: float) -> str:
    h = int(seconds // 3600)
    m = int(seconds % 3600 // 60)
    s = seconds % 60
    return f"{h:02d}:{m:02d}:{s:05.2f}"


def make_epic_fixture(root, sr=24000, n_videos=2, video_secs=12.0, n_records=6, with_pddl=False, n_attrs=5):
    """Returns (audio_h5_path, annotations_pkl_path, video_durs_csv_path)."""
    import h5py

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)

    h5_path = os.path.join(root, "EPIC_audio.hdf5")
    video_ids = [f"P01_{i:02d}" for i in range(n_videos)]
    with h5py.File(h5_path, "w") as f:
        for vid in video_ids:
            f.create_dataset(vid, data=(rng.standard_normal(int(sr * video_secs)) * 0.1).astype(np.float32))

    rows = []
    for r in range(n_records):
        vid = video_ids[r % n_videos]
        start = 0.5 + r * 1.3
        stop = start + (0.8 if r % 3 == 0 else 3.0)  # mix of short + long segments
        row = {
            "participant_id": "P01",
            "video_id": vid,
            "start_timestamp": _ts(start),
            "stop_timestamp": _ts(min(stop, video_secs - 0.1)),
            "verb_class": int(r % 4),
            "noun_class": int(r % 7),
            "noun_embedding": rng.standard_normal((1, 512)).astype(np.float32),
        }
        if with_pddl:
            vec = np.zeros(n_attrs, np.float32)
            vec[r % n_attrs] = 1.0
            row["precs_vec"] = -vec
            row["posts_vec"] = vec
        rows.append(row)
    df = pd.DataFrame(rows, index=[f"nar_{i}" for i in range(n_records)])
    ann_path = os.path.join(root, "annotations.pkl")
    df.to_pickle(ann_path)

    durs = pd.DataFrame({"video_id": video_ids, "duration": [video_secs] * n_videos})
    durs_path = os.path.join(root, "EPIC_100_video_info.csv")
    durs.to_csv(durs_path, index=False)
    return h5_path, ann_path, durs_path


def make_vgg_fixture(root, sr=24000, n_clips=4, clip_secs=3.0):
    from scipy.io import wavfile

    os.makedirs(root, exist_ok=True)
    audio_dir = os.path.join(root, "audio")
    os.makedirs(audio_dir, exist_ok=True)
    rng = np.random.default_rng(1)
    rows = []
    for i in range(n_clips):
        name = f"clip_{i:03d}.mp4"
        wav = (rng.standard_normal(int(sr * clip_secs)) * 6000).astype(np.int16)
        wavfile.write(os.path.join(audio_dir, name[:-4] + ".wav"), sr, wav)
        rows.append({"video": name, "class_id": i % 3})
    df = pd.DataFrame(rows)
    pkl = os.path.join(root, "test.pkl")
    df.to_pickle(pkl)
    return audio_dir, pkl


def epic_cfg(root, gru=False, pddl=False):
    from asf_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.EPICKITCHENS.AUDIO_DATA_FILE = os.path.join(root, "EPIC_audio.hdf5")
    cfg.EPICKITCHENS.ANNOTATIONS_DIR = root
    for key in (
        "PROCESSED_TRAIN_LIST",
        "PROCESSED_VAL_LIST",
        "PROCESSED_TEST_LIST",
    ):
        setattr(cfg.EPICKITCHENS, key, "annotations.pkl")
    cfg.AUDIO_DATA.CLIP_SECS = 1.999
    cfg.AUDIO_DATA.NUM_FRAMES = 400
    cfg.SLOWFAST.ALPHA = 4
    name = "EpicKitchens"
    if gru and pddl:
        name = "EpicKitchensGRUwithPDDL"
    elif gru:
        name = "EpicKitchensGRU"
    elif pddl:
        name = "EpicKitchensWithPDDL"
    cfg.TRAIN.DATASET = name
    cfg.TEST.DATASET = name
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TEST.BATCH_SIZE = 4
    cfg.DATA_LOADER.NUM_WORKERS = 2
    return cfg


def write_attributes_csv(root, n_attrs=5):
    import pandas as pd, os

    path = os.path.join(root, "attributes.csv")
    pd.DataFrame({"attribute": [f"attr_{i}" for i in range(n_attrs)]}).to_csv(path, index=False)
    return path


def tiny_cfg(root, gru=False, pddl=False):
    """Small end-to-end config: 8 kHz, 64x32 spectrograms, 2-device mesh."""
    cfg = epic_cfg(root, gru=gru, pddl=pddl)
    cfg.AUDIO_DATA.SAMPLING_RATE = 8000
    cfg.AUDIO_DATA.N_FFT = 256
    cfg.AUDIO_DATA.CLIP_SECS = 0.32
    cfg.AUDIO_DATA.NUM_FRAMES = 64
    cfg.AUDIO_DATA.NUM_FREQUENCIES = 32
    cfg.AUDIO_DATA.SPECTROGRAM_OVERLAP = 0.1
    cfg.AUDIO_DATA.MAX_NB_SPECTROGRAMS = 4
    cfg.SLOWFAST.ALPHA = 4
    cfg.MODEL.NUM_CLASSES = [6, 8]  # >=5 for top-5
    cfg.MODEL.MODEL_NAME = "AudioSlowFastGRU" if gru else "AudioSlowFast"
    cfg.MODEL.ONLY_ACTION_RECOGNITION = not pddl
    cfg.RESNET.DEPTH = 26  # tiny 1-block-per-stage variant
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.RESNET.FREQUENCY_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.FREQUENCY_DILATIONS = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.TRAIN.EVAL_PERIOD = 1
    cfg.TRAIN.CHECKPOINT_PERIOD = 1
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TEST.BATCH_SIZE = 4
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.LOG_PERIOD = 1
    cfg.TPU.DATA_PARALLEL = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATA_LOADER.NUM_WORKERS = 2
    if pddl:
        cfg.MODEL.PDDL_ATTRIBUTES = write_attributes_csv(root)
    return cfg
