"""GRU-config cold-start: wall-clock of a FRESH-cache `train(cfg)` at the
asf-gru-state geometry (R50 SlowFast GRU+PDDL, batch 16, 20-window chains,
400-frame spectrograms) with TPU.GRU_SINGLE_BUCKET + TPU.WARM_COMPILE_ON_START.

VERDICT r3 next-step #7: with per-bucket GRU programs a real run could stall
mid-epoch on multi-minute compiles (reference counterpart: the ragged-shape
loader at /root/reference/audio_slowfast/datasets/loader.py:18-63 — eager
torch pays no compile at all, so this cost is repo-only and must be bounded
and documented). This script measures the bound: time from process start to
(a) warm-up complete (every program train(cfg) will dispatch is compiled)
and (b) first train step executed, on a synthetic production-geometry
dataset whose HDF5 samples sit on the int16 PCM grid so the int16 wire —
and therefore the program cache keys — match a real EPIC archive.

Usage:  python scripts/bench_gru_coldstart.py             # cold (fresh cache)
        ASF_COLD=0 python scripts/bench_gru_coldstart.py  # warm control
        ASF_SMOKE=1 ASF_PLATFORM=cpu ASF_CPU_DEVICES=1 \
            python scripts/bench_gru_coldstart.py         # tiny-geometry plumbing check
"""

import json
import logging
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

T_START = time.time()
if int(os.environ.get("ASF_COLD", "1")):
    _cache = tempfile.mkdtemp(prefix="asf_coldstart_cache_")
    os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache
    print(f"cold start: fresh compilation cache at {_cache}")

from asf_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache

apply_platform_env()
enable_compilation_cache()

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import h5py
import numpy as np
import pandas as pd

from fixtures import _ts, write_attributes_csv

ROOT = "/tmp/bench_gru_coldstart"
SMOKE = bool(int(os.environ.get("ASF_SMOKE", "0")))
N_RECORDS = int(os.environ.get("ASF_BENCH_CLIPS", 12 if SMOKE else 40))
SR = 8000 if SMOKE else 24000


def make_dataset():
    """Production-geometry EPIC-GRU fixture: int16-PCM-grid HDF5 + PDDL pkl."""
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT, exist_ok=True)
    rng = np.random.default_rng(0)
    sr = SR
    video_secs = 4.0 + N_RECORDS * 1.35
    video_ids = ["P01_00", "P01_01"]
    with h5py.File(os.path.join(ROOT, "EPIC_audio.hdf5"), "w") as f:
        for vid in video_ids:
            pcm = rng.integers(-3000, 3000, int(sr * video_secs)).astype(np.int16)
            f.create_dataset(vid, data=pcm.astype(np.float32) / 32768.0)
    rows = []
    n_attrs = 5
    for r in range(N_RECORDS):
        start = 0.5 + r * 1.3
        vec = np.zeros(n_attrs, np.float32)
        vec[r % n_attrs] = 1.0
        rows.append(
            {
                "participant_id": "P01",
                "video_id": video_ids[r % 2],
                "start_timestamp": _ts(start),
                "stop_timestamp": _ts(min(start + 3.0, video_secs - 0.1)),
                "verb_class": int(r % 11),
                "noun_class": int(r % 23),
                "noun_embedding": rng.standard_normal((1, 512)).astype(np.float32),
                "precs_vec": -vec,
                "posts_vec": vec,
            }
        )
    pd.DataFrame(rows, index=[f"nar_{i}" for i in range(N_RECORDS)]).to_pickle(
        os.path.join(ROOT, "annotations.pkl")
    )


def make_cfg():
    from asf_tpu.config import get_cfg

    cfg = get_cfg()
    # --- asf-gru-state.yaml model/geometry (models/asf/config/asf-gru-state.yaml)
    cfg.MODEL.MODEL_NAME = "AudioSlowFastGRU"
    cfg.MODEL.NUM_CLASSES = [97, 300]
    cfg.MODEL.ONLY_ACTION_RECOGNITION = False
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.STATE_LOSS_FUNC = "masked_loss"
    cfg.MODEL.DROPOUT_RATE = 0.5
    cfg.MODEL.PDDL_ATTRIBUTES = write_attributes_csv(ROOT, n_attrs=5)
    cfg.RESNET.DEPTH = 50
    cfg.RESNET.ZERO_INIT_FINAL_BN = True
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3, 3], [4, 4], [6, 6], [3, 3]]
    cfg.RESNET.FREQUENCY_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.FREQUENCY_DILATIONS = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO = 2
    cfg.SLOWFAST.FUSION_KERNEL_SZ = 7
    cfg.AUDIO_DATA.CLIP_SECS = 1.999
    cfg.AUDIO_DATA.NUM_FRAMES = 400
    cfg.AUDIO_DATA.SPECTROGRAM_OVERLAP = 1.0
    cfg.AUDIO_DATA.MAX_NB_SPECTROGRAMS = 20
    cfg.BN.USE_PRECISE_STATS = True
    cfg.BN.NUM_BATCHES_PRECISE = 2  # bounded for the bench; same program
    cfg.BN.FREEZE = True
    cfg.TRAIN.BATCH_SIZE = 16
    cfg.TEST.BATCH_SIZE = 16
    cfg.TRAIN.DATASET = "EpicKitchensGRUwithPDDL"
    cfg.TEST.DATASET = "EpicKitchensGRUwithPDDL"
    cfg.TEST.ENABLE = False
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.TRAIN.EVAL_PERIOD = 1
    cfg.TRAIN.CHECKPOINT_PERIOD = 1
    # --- fixture paths
    cfg.EPICKITCHENS.AUDIO_DATA_FILE = os.path.join(ROOT, "EPIC_audio.hdf5")
    cfg.EPICKITCHENS.ANNOTATIONS_DIR = ROOT
    for key in ("PROCESSED_TRAIN_LIST", "PROCESSED_VAL_LIST", "PROCESSED_TEST_LIST"):
        setattr(cfg.EPICKITCHENS, key, "annotations.pkl")
    cfg.EPICKITCHENS.SKIP_PREPARATION = True
    # --- production TPU policy; the cold-start bound under test
    cfg.TPU.GRU_SINGLE_BUCKET = True
    cfg.TPU.WARM_COMPILE_ON_START = True
    cfg.TPU.USE_PALLAS_DSP = True
    cfg.TPU.DATA_PARALLEL = 1
    cfg.DATA_LOADER.NUM_WORKERS = 2
    cfg.LOG_PERIOD = 1
    cfg.TENSORBOARD.ENABLE = False
    cfg.OUTPUT_DIR = os.path.join(ROOT, "out")
    if SMOKE:  # tiny-geometry plumbing check (CPU-runnable; same code path)
        cfg.AUDIO_DATA.SAMPLING_RATE = SR
        cfg.AUDIO_DATA.N_FFT = 256
        cfg.AUDIO_DATA.CLIP_SECS = 0.32
        cfg.AUDIO_DATA.NUM_FRAMES = 64
        cfg.AUDIO_DATA.NUM_FREQUENCIES = 32
        cfg.AUDIO_DATA.SPECTROGRAM_OVERLAP = 0.1
        cfg.AUDIO_DATA.MAX_NB_SPECTROGRAMS = 4
        cfg.MODEL.NUM_CLASSES = [11, 23]
        cfg.RESNET.DEPTH = 26
        cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1, 1], [1, 1], [1, 1], [1, 1]]
        cfg.TRAIN.BATCH_SIZE = 4
        cfg.TEST.BATCH_SIZE = 4
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.TPU.USE_PALLAS_DSP = False
        cfg.TPU.STEPS_PER_DISPATCH = 2
        cfg.BN.NUM_BATCHES_PRECISE = 1
    return cfg


class PhaseTimer(logging.Handler):
    """Record wall-clock of warm-up and first-step log events."""

    def __init__(self):
        super().__init__()
        self.first_warm = None
        self.last_warm = None
        self.first_iter = None

    def emit(self, record):
        msg = record.getMessage()
        now = time.time()
        if "[warm]" in msg:
            self.first_warm = self.first_warm or now
            self.last_warm = now
        elif '"train_iter"' in msg and self.first_iter is None:
            self.first_iter = now


def main():
    make_dataset()
    cfg = make_cfg()
    # configure the stream handler first (setup_logging early-returns once
    # any handler exists), then piggyback the phase timer on the same logger
    from asf_tpu.utils.logging import setup_logging

    setup_logging()
    timer = PhaseTimer()
    logging.getLogger("asf_tpu").addHandler(timer)  # propagate=False tree root

    from asf_tpu.engine.train_loop import train

    t_setup = time.time()
    train(cfg)
    t_end = time.time()

    out = {
        "metric": "gru_coldstart",
        "cold": bool(int(os.environ.get("ASF_COLD", "1"))),
        "setup_s": round(t_setup - T_START, 1),
        "warmup_s": round((timer.last_warm or t_setup) - (timer.first_warm or t_setup), 1),
        "to_first_step_s": round((timer.first_iter or t_end) - T_START, 1),
        "total_s": round(t_end - T_START, 1),
        "target_s": 900,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
