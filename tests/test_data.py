"""Data pipeline tests on synthetic fixtures (hermetic; no real EPIC/VGG data).

Mirrors the reference's data-dependent integration tests
(tests/test_dataloader.py, test_dataloader_slide.py, test_dataset_instances.py
in /root/reference) but against synthesized HDF5/wav/pickle fixtures.
"""

import os

import numpy as np

from fixtures import epic_cfg, make_epic_fixture, make_vgg_fixture
from asf_tpu.data.build import build_dataset
from asf_tpu.data.loader import AsfLoader, bucket_windows, collate, construct_loader
from asf_tpu.data.records import timestamp_to_sec


def test_timestamp_to_sec():
    assert abs(timestamp_to_sec("00:01:30.50") - 90.5) < 1e-9
    assert abs(timestamp_to_sec("01:00:00.000") - 3600.0) < 1e-9
    assert abs(timestamp_to_sec("00:00:02.25") - 2.25) < 1e-9


def test_epic_regular_items(tmp_path):
    root = str(tmp_path)
    make_epic_fixture(root)
    cfg = epic_cfg(root)
    ds = build_dataset("EpicKitchens", cfg, "train")
    assert len(ds) == 6
    item = ds[0]
    clip_samples = int(round(24000 * 1.999)) - 1
    assert item["waveform"].shape == (clip_samples,)
    assert item["waveform"].dtype == np.float32
    assert 0 < item["n_valid"] <= clip_samples
    assert set(item["label"].keys()) == {"verb", "noun"}
    # short segment (record 0 is 0.8 s) -> n_valid < clip_samples and zero tail
    short = ds[0]
    assert short["n_valid"] < clip_samples
    assert np.all(short["waveform"][int(short["n_valid"]):] == 0)


def test_epic_test_mode_ensemble_views(tmp_path):
    root = str(tmp_path)
    make_epic_fixture(root)
    cfg = epic_cfg(root)
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 3
    ds = build_dataset("EpicKitchens", cfg, "test")
    assert len(ds) == 6 * 3  # replicated per view


def test_epic_gru_items_and_collate(tmp_path):
    root = str(tmp_path)
    make_epic_fixture(root, with_pddl=True)
    cfg = epic_cfg(root, gru=True, pddl=True)
    ds = build_dataset("EpicKitchensGRUwithPDDL", cfg, "train")
    item = ds[1]  # 3 s segment -> ceil((3-1)/(1.999-1)) = 3 windows
    assert item["waveform"].ndim == 2
    assert item["length"] == item["waveform"].shape[0] == 3
    assert item["noun_embedding"].shape == (512,)
    assert item["label"]["precs"].shape == (5,)

    batch = collate([ds[i] for i in range(4)], max_windows=cfg.AUDIO_DATA.MAX_NB_SPECTROGRAMS)
    b, nb, s = batch["waveform"].shape
    assert b == 4 and nb == bucket_windows(int(batch["lengths"].max()), 15)
    assert batch["noun_embedding"].shape == (4, 512)
    assert batch["labels"]["verb"].shape == (4,)
    assert batch["labels"]["precs"].shape == (4, 5)
    assert batch["lengths"].min() >= 1


def test_gru_window_starts_match_reference_semantics(tmp_path):
    """Window i must start at segment_start + i * sr (1 s stride, the
    reference's pack_audio_gru:47 behaviour)."""
    root = str(tmp_path)
    make_epic_fixture(root)
    cfg = epic_cfg(root, gru=True)
    ds = build_dataset("EpicKitchensGRU", cfg, "train")
    rec = ds._audio_records[1]
    assert rec.num_audio_samples >= ds.clip_size  # long segment
    item = ds._get_item_gru(1, np.random.default_rng(0))
    import h5py

    with h5py.File(cfg.EPICKITCHENS.AUDIO_DATA_FILE, "r") as f:
        video = f[rec.untrimmed_video_name][()]
    sr = 24000
    for i in range(int(item["length"])):
        start = rec.start_audio_sample + i * sr
        want = video[start : start + ds.clip_samples]
        np.testing.assert_allclose(item["waveform"][i, : len(want)], want, rtol=1e-6)


def test_vggsound_dataset_and_loader(tmp_path):
    root = str(tmp_path)
    audio_dir, pkl = make_vgg_fixture(root)
    from asf_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.VGGSOUND.AUDIO_DATA_DIR = audio_dir
    cfg.VGGSOUND.ANNOTATIONS_DIR = root
    cfg.VGGSOUND.TEST_LIST = "test.pkl"
    cfg.VGGSOUND.TRAIN_LIST = "test.pkl"
    cfg.VGGSOUND.VAL_LIST = "test.pkl"
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TEST.BATCH_SIZE = 2
    cfg.DATA_LOADER.NUM_WORKERS = 2

    loader = construct_loader(cfg, "train")
    batch = next(iter(loader))
    clip_samples = int(round(24000 * 1.279)) - 1
    assert batch["waveform"].shape == (2, clip_samples)
    assert batch["labels"]["class_id"].shape == (2,)
    assert len(loader) == 2  # 4 clips, batch 2, drop_last


def test_loader_shuffle_epoch_determinism(tmp_path):
    root = str(tmp_path)
    make_epic_fixture(root)
    cfg = epic_cfg(root)
    loader = construct_loader(cfg, "train")
    loader.set_epoch(0)
    b0 = next(iter(loader))["index"]
    loader.set_epoch(0)
    b0b = next(iter(loader))["index"]
    np.testing.assert_array_equal(b0, b0b)
    loader.set_epoch(1)
    b1 = next(iter(loader))["index"]
    assert not np.array_equal(b0, b1)


def _epoch_batches(cfg, epoch, num_workers):
    cfg.DATA_LOADER.NUM_WORKERS = num_workers
    loader = construct_loader(cfg, "train")
    loader.set_epoch(epoch)
    return list(loader)


def test_loader_item_determinism_across_workers(tmp_path):
    """Same seed => byte-identical batches regardless of NUM_WORKERS (the
    round-1 shared-Generator race made this scheduling-dependent); a new
    epoch re-keys the item-level randomness (clip starts), not just the
    shuffle order."""
    root = str(tmp_path)
    make_epic_fixture(root)
    cfg = epic_cfg(root)
    cfg.TRAIN.BATCH_SIZE = 2

    a = _epoch_batches(cfg, 0, num_workers=1)
    b = _epoch_batches(cfg, 0, num_workers=4)
    assert len(a) == len(b) > 0
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["index"], bb["index"])
        np.testing.assert_array_equal(ba["waveform"], bb["waveform"])
        np.testing.assert_array_equal(ba["n_valid"], bb["n_valid"])
        for k in ba["labels"]:
            np.testing.assert_array_equal(ba["labels"][k], bb["labels"][k])

    # same records, epoch 1: random clip starts must differ for at least one
    # record longer than the clip (uniform draw re-keyed by epoch)
    c = _epoch_batches(cfg, 1, num_workers=1)
    by_index_a = {
        int(i): ba["waveform"][j] for ba in a for j, i in enumerate(ba["index"])
    }
    by_index_c = {
        int(i): bc["waveform"][j] for bc in c for j, i in enumerate(bc["index"])
    }
    assert any(
        not np.array_equal(by_index_a[i], by_index_c[i]) for i in by_index_a
    ), "epoch change did not re-key item randomness"


def test_loader_rank_sharding(tmp_path):
    """Multi-host shard split: exhaustive, EQUAL per-rank counts via
    wrap-padding (DistributedSampler parity, reference datasets/utils.py:87
    — unequal counts would desync hosts at the first collective of the
    extra batch), and disjoint whenever the split is even."""
    root = str(tmp_path)
    make_epic_fixture(root)
    cfg = epic_cfg(root)

    for world in (2, 4):
        seen = []
        counts = []
        for rank in (range(world)):
            cfg.SHARD_ID, cfg.NUM_SHARDS = rank, world
            cfg.TRAIN.BATCH_SIZE = 1
            loader = construct_loader(cfg, "train")
            loader.set_epoch(3)
            idx = [int(i) for b in loader for i in b["index"]]
            seen.append(idx)
            counts.append(len(idx))
        assert len(set(counts)) == 1, f"unequal rank counts: {counts}"
        union = set().union(*map(set, seen))
        assert union == set(range(6)), "rank shards not exhaustive"
        n_pad = world * counts[0] - 6
        overlap = sum(map(len, seen)) - len(union)
        assert overlap == n_pad, f"overlap {overlap} != wrap-pad {n_pad}"
        if n_pad == 0:
            assert all(len(set(s)) == len(s) for s in seen)
    cfg.SHARD_ID, cfg.NUM_SHARDS = 0, 1


def test_slide_whole_video(tmp_path):
    root = str(tmp_path)
    make_epic_fixture(root)
    cfg = epic_cfg(root)
    cfg.TEST.DATASET = "EpicKitchensSlide"
    cfg.TEST.SLIDE.ENABLE = True
    cfg.TEST.SLIDE.WIN_SIZE = 2.0
    cfg.TEST.SLIDE.HOP_SIZE = 2.0
    cfg.TEST.SLIDE.INSIDE_ACTION_BOUNDS = False
    cfg.TEST.SLIDE.PER_ACTION_INSTANCE = False
    ds = build_dataset("EpicKitchensSlide", cfg, "test")
    assert len(ds) > 0
    item = ds[0]
    assert item["label"]["verb"].shape == (4,)  # MAX_OVERLAP multi-labels
    # at least one window got annotated
    labels = np.stack([ds[i]["label"]["verb"] for i in range(len(ds))])
    assert (labels != -1).any()


def test_slide_action_bounds_and_per_instance(tmp_path):
    root = str(tmp_path)
    make_epic_fixture(root)
    cfg = epic_cfg(root)
    cfg.TEST.DATASET = "EpicKitchensSlide"
    cfg.TEST.SLIDE.INSIDE_ACTION_BOUNDS = True
    cfg.TEST.SLIDE.PER_ACTION_INSTANCE = True
    ds = build_dataset("EpicKitchensSlide", cfg, "test")
    assert len(ds) == 6  # one record per annotation

    cfg.TEST.SLIDE.PER_ACTION_INSTANCE = False
    cfg.TEST.SLIDE.WIN_SIZE = 1.0
    cfg.TEST.SLIDE.HOP_SIZE = 1.0
    ds2 = build_dataset("EpicKitchensSlide", cfg, "test")
    assert len(ds2) >= len(ds)  # sliding creates >= one window per annotation


def test_vgg_int16_transfer_parity(tmp_path):
    """TPU.INT16_TRANSFER ships raw int16 PCM; the device-side /32768 in the
    input pipeline must reproduce the f32 host conversion bit-for-bit."""
    import jax.numpy as jnp

    from asf_tpu.config import get_cfg
    from asf_tpu.engine.steps import make_input_pipeline

    root = str(tmp_path)
    audio_dir, pkl = make_vgg_fixture(root)
    cfg = get_cfg()
    cfg.VGGSOUND.AUDIO_DATA_DIR = audio_dir
    cfg.VGGSOUND.ANNOTATIONS_DIR = root
    cfg.VGGSOUND.TEST_LIST = cfg.VGGSOUND.TRAIN_LIST = cfg.VGGSOUND.VAL_LIST = "test.pkl"
    cfg.AUDIO_DATA.NUM_FRAMES = 64
    cfg.AUDIO_DATA.NUM_FREQUENCIES = 32
    cfg.TPU.DSP_PRECISION = "HIGHEST"
    cfg.TPU.COMPUTE_DTYPE = "float32"

    cfg.TPU.INT16_TRANSFER = True
    ds16 = build_dataset("Vggsound", cfg, "val")
    cfg.TPU.INT16_TRANSFER = False
    dsf = build_dataset("Vggsound", cfg, "val")

    i16, if32 = ds16[0], dsf[0]
    assert i16["waveform"].dtype == np.int16
    assert if32["waveform"].dtype == np.float32
    assert int(i16["n_valid"]) == int(if32["n_valid"])

    pipeline = make_input_pipeline(cfg)
    nv = np.asarray([i16["n_valid"]], np.int32)
    p16 = pipeline(jnp.asarray(i16["waveform"][None]), jnp.asarray(nv), None, train=False)
    pf = pipeline(jnp.asarray(if32["waveform"][None]), jnp.asarray(nv), None, train=False)
    for a, b in zip(p16, pf):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vgg_int16_disabled_on_non_conforming_files(tmp_path):
    """A dataset with any non-mono-int16 file must not ship raw PCM: the
    construct-time probe flips the whole dataset to scaled float32
    (ADVICE r2 medium — a mixed batch would enter the model at ~32768x)."""
    from scipy.io import wavfile

    from asf_tpu.config import get_cfg

    root = str(tmp_path)
    audio_dir, pkl = make_vgg_fixture(root)
    # overwrite the FIRST file with stereo int16 -> float fallback in load_wav
    sr = 24000
    rng = np.random.default_rng(3)
    stereo = (rng.standard_normal((sr * 3, 2)) * 6000).astype(np.int16)
    wavfile.write(os.path.join(audio_dir, "clip_000.wav"), sr, stereo)

    cfg = get_cfg()
    cfg.VGGSOUND.AUDIO_DATA_DIR = audio_dir
    cfg.VGGSOUND.ANNOTATIONS_DIR = root
    cfg.VGGSOUND.TEST_LIST = cfg.VGGSOUND.TRAIN_LIST = cfg.VGGSOUND.VAL_LIST = "test.pkl"
    cfg.TPU.INT16_TRANSFER = True
    ds = build_dataset("Vggsound", cfg, "val")
    assert ds.int16 is False
    assert all(ds[i]["waveform"].dtype == np.float32 for i in range(len(ds)))


def test_collate_rescues_mixed_dtype_batch():
    """Safety net below the probe: if raw-PCM int16 and float32 items DO meet
    in one batch, collate applies the deferred /32768 scale instead of
    letting np.stack promote raw PCM to float at full amplitude."""
    from asf_tpu.data.loader import collate

    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(100) * 6000).astype(np.int16)
    flt = rng.standard_normal(100).astype(np.float32) * 0.2

    def item(w, idx):
        return {
            "waveform": w,
            "n_valid": np.int32(100),
            "label": {"class_id": np.int32(idx)},
            "index": idx,
            "metadata": {},
        }

    batch = collate([item(pcm, 0), item(flt, 1)])
    assert batch["waveform"].dtype == np.float32
    np.testing.assert_allclose(
        batch["waveform"][0], pcm.astype(np.float32) / 32768.0, rtol=0, atol=0
    )
    np.testing.assert_array_equal(batch["waveform"][1], flt)

    # pure-int16 batches keep the int16 wire format
    batch16 = collate([item(pcm, 0), item(pcm, 1)])
    assert batch16["waveform"].dtype == np.int16


def _align_epic_h5(root, int16_native=False, seed=7):
    """Rewrite the fixture HDF5 with 16-bit-PCM-grid values (what a real
    archive built from int16 wavs contains), optionally stored as raw int16
    datasets (wav_to_hdf5 --int16)."""
    import h5py

    rng = np.random.default_rng(seed)
    path = os.path.join(root, "EPIC_audio.hdf5")
    with h5py.File(path, "a") as f:
        for vid in list(f.keys()):
            n = f[vid].shape[0]
            pcm = rng.integers(-6000, 6000, n).astype(np.int16)
            del f[vid]
            f.create_dataset(
                vid, data=pcm if int16_native else pcm.astype(np.float32) / 32768.0
            )
    return path


def test_epic_int16_transfer_parity(tmp_path):
    """A grid-aligned EPIC HDF5 ships raw int16 under TPU.INT16_TRANSFER;
    scaling back by /32768 must reproduce the float path bit-for-bit
    (the jitted pipeline applies the same scale on device)."""
    root = str(tmp_path)
    make_epic_fixture(root)
    _align_epic_h5(root)
    cfg = epic_cfg(root)

    cfg.TPU.INT16_TRANSFER = True
    ds16 = build_dataset("EpicKitchens", cfg, "train")
    assert ds16.int16 is True
    cfg.TPU.INT16_TRANSFER = False
    dsf = build_dataset("EpicKitchens", cfg, "train")

    for i in range(len(ds16)):
        a, b = ds16[i], dsf[i]
        assert a["waveform"].dtype == np.int16
        assert b["waveform"].dtype == np.float32
        assert int(a["n_valid"]) == int(b["n_valid"])
        np.testing.assert_array_equal(
            a["waveform"].astype(np.float32) / 32768.0, b["waveform"]
        )


def test_epic_int16_gru_items(tmp_path):
    root = str(tmp_path)
    make_epic_fixture(root)
    _align_epic_h5(root)
    cfg = epic_cfg(root, gru=True)
    cfg.TPU.INT16_TRANSFER = True
    ds16 = build_dataset("EpicKitchensGRU", cfg, "train")
    assert ds16.int16 is True
    cfg.TPU.INT16_TRANSFER = False
    dsf = build_dataset("EpicKitchensGRU", cfg, "train")
    a, b = ds16[1], dsf[1]
    assert a["waveform"].dtype == np.int16 and a["waveform"].ndim == 2
    np.testing.assert_array_equal(
        a["waveform"].astype(np.float32) / 32768.0, b["waveform"]
    )
    np.testing.assert_array_equal(a["n_valid"], b["n_valid"])

    # Collation keeps the int16 wire format for all-PCM chain batches (the
    # device pipeline applies the deferred /32768; a float32 collate buffer
    # would silently absorb raw PCM at ~32768x amplitude)...
    from asf_tpu.data.loader import collate

    batch16 = collate([ds16[1], ds16[2]])
    batchf = collate([dsf[1], dsf[2]])
    assert batch16["waveform"].dtype == np.int16
    np.testing.assert_array_equal(
        batch16["waveform"].astype(np.float32) / 32768.0, batchf["waveform"]
    )
    # ...and a MIXED batch (one float chain) falls back to float32 with the
    # PCM rows scaled on the host.
    mixed = collate([ds16[1], dsf[2]])
    assert mixed["waveform"].dtype == np.float32
    np.testing.assert_array_equal(mixed["waveform"][0], batchf["waveform"][0])
    np.testing.assert_array_equal(mixed["waveform"][1], batchf["waveform"][1])


def test_epic_int16_disabled_on_unaligned_archive(tmp_path):
    """The stock fixture stores arbitrary float32 noise (off the PCM grid):
    the construct-time probe must fall back to float32 items."""
    root = str(tmp_path)
    make_epic_fixture(root)
    cfg = epic_cfg(root)
    cfg.TPU.INT16_TRANSFER = True
    ds = build_dataset("EpicKitchens", cfg, "train")
    assert ds.int16 is False
    assert ds[0]["waveform"].dtype == np.float32


def test_epic_int16_disabled_on_transforms(tmp_path):
    """Waveform augmentations run on the host in float and leave the PCM
    grid; any transformed record disables the int16 wire format."""
    import pandas as pd

    root = str(tmp_path)
    make_epic_fixture(root)
    _align_epic_h5(root)
    ann = os.path.join(root, "annotations.pkl")
    df = pd.read_pickle(ann)
    df["transformation"] = ["none"] * (len(df) - 1) + ["pitch_shift"]
    df.to_pickle(ann)
    cfg = epic_cfg(root)
    cfg.TPU.INT16_TRANSFER = True
    ds = build_dataset("EpicKitchens", cfg, "train")
    assert ds.int16 is False
    assert ds[0]["waveform"].dtype == np.float32


def test_epic_int16_native_archive_and_float_fallback(tmp_path):
    """An int16-native HDF5 (wav_to_hdf5 --int16) is served raw under
    INT16_TRANSFER and scaled to float32 when the flag is off."""
    root = str(tmp_path)
    make_epic_fixture(root)
    _align_epic_h5(root, int16_native=True)
    cfg = epic_cfg(root)
    cfg.TPU.INT16_TRANSFER = True
    ds16 = build_dataset("EpicKitchens", cfg, "train")
    assert ds16.int16 is True
    assert ds16[0]["waveform"].dtype == np.int16
    cfg.TPU.INT16_TRANSFER = False
    dsf = build_dataset("EpicKitchens", cfg, "train")
    a, b = ds16[2], dsf[2]
    assert b["waveform"].dtype == np.float32
    np.testing.assert_array_equal(
        a["waveform"].astype(np.float32) / 32768.0, b["waveform"]
    )


def test_wav_to_hdf5_int16_flag(tmp_path):
    """--int16 stores raw PCM datasets the EPIC reader recognises."""
    import h5py
    from scipy.io import wavfile

    from asf_tpu.tools.wav_to_hdf5 import main as wav_to_hdf5_main

    root = str(tmp_path)
    audio_dir = os.path.join(root, "wavs")
    os.makedirs(audio_dir)
    rng = np.random.default_rng(11)
    sr = 24000
    for i in range(2):
        pcm = (rng.standard_normal(sr) * 6000).astype(np.int16)
        wavfile.write(os.path.join(audio_dir, f"P99_{i:02d}.wav"), sr, pcm)
    out = os.path.join(root, "audio16.hdf5")
    wav_to_hdf5_main([audio_dir, out, "--sampling_rate", str(sr), "--int16"])
    with h5py.File(out, "r") as f:
        assert set(f.keys()) == {"P99_00", "P99_01"}
        assert all(f[k].dtype == np.int16 for k in f)


def test_gru_int16_pipeline_parity():
    """The jitted input pipeline's deferred /32768 must also cover the 3-D
    GRU chain layout (B, N, S) that the int16-preserving collate now emits
    (the reshape to (B*N, S) happens AFTER the dtype check)."""
    import jax.numpy as jnp

    from asf_tpu.config import get_cfg
    from asf_tpu.engine.steps import make_input_pipeline

    cfg = get_cfg()
    cfg.AUDIO_DATA.SAMPLING_RATE = 8000
    cfg.AUDIO_DATA.N_FFT = 256
    cfg.AUDIO_DATA.CLIP_SECS = 0.32
    cfg.AUDIO_DATA.NUM_FRAMES = 64
    cfg.AUDIO_DATA.NUM_FREQUENCIES = 32
    cfg.SLOWFAST.ALPHA = 4
    cfg.TPU.DSP_PRECISION = "HIGHEST"
    cfg.TPU.COMPUTE_DTYPE = "float32"

    pipeline = make_input_pipeline(cfg)
    rng = np.random.default_rng(11)
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    pcm = rng.integers(-32768, 32768, (2, 3, clip)).astype(np.int16)
    n_valid = np.full((2, 3), clip, np.int32)

    got = pipeline(jnp.asarray(pcm), jnp.asarray(n_valid), None, train=False)
    want = pipeline(
        jnp.asarray(pcm.astype(np.float32) / 32768.0),
        jnp.asarray(n_valid),
        None,
        train=False,
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def _epic_edge_annotations(root, sr=24000, video_secs=12.0):
    """Overwrite the fixture annotations with end-of-video + degenerate rows."""
    import pandas as pd

    from fixtures import _ts

    rows = [
        # long segment whose 1 s-hop GRU windows run PAST the video end:
        # starts 1.5 s before the end but spans 4 s
        {
            "participant_id": "P01",
            "video_id": "P01_00",
            "start_timestamp": _ts(video_secs - 1.5),
            "stop_timestamp": _ts(video_secs + 2.5),
            "verb_class": 1,
            "noun_class": 2,
            "noun_embedding": np.zeros((1, 512), np.float32),
        },
        # degenerate annotation: stop <= start (exists in real EPIC data)
        {
            "participant_id": "P01",
            "video_id": "P01_00",
            "start_timestamp": _ts(3.0),
            "stop_timestamp": _ts(2.0),
            "verb_class": 0,
            "noun_class": 0,
            "noun_embedding": np.zeros((1, 512), np.float32),
        },
    ]
    pd.DataFrame(rows, index=["nar_a", "nar_b"]).to_pickle(
        os.path.join(root, "annotations.pkl")
    )


def test_gru_windows_past_video_end_and_degenerate(tmp_path):
    """Windows that run past the HDF5 video end must count only in-video
    samples as valid (the reference's numpy slice TRUNCATES there and
    edge-pads the spectrogram — zero-padding counted as valid would
    spectrogram literal zeros); degenerate stop<=start annotations must not
    crash the GRU path (the regular path already guards them)."""
    root = str(tmp_path)
    make_epic_fixture(root)
    _epic_edge_annotations(root)
    cfg = epic_cfg(root, gru=True)
    ds = build_dataset("EpicKitchensGRU", cfg, "train")

    sr = cfg.AUDIO_DATA.SAMPLING_RATE
    video_len = int(sr * 12.0)
    rec = ds._audio_records[0]
    item = ds[0]
    n = int(item["length"])
    assert n >= 2
    for i in range(n):
        start_i = rec.start_audio_sample + i * sr
        expect = max(1, min(ds.clip_samples, video_len - start_i))
        assert int(item["n_valid"][i]) == expect, (i, item["n_valid"][i], expect)
        # the zero-pad past the video end is NOT flagged valid
        assert np.all(item["waveform"][i, item["n_valid"][i]:] == 0)

    # degenerate record: no crash, well-defined minimal validity
    item2 = ds[1]
    assert int(item2["length"]) >= 1
    assert np.all(np.asarray(item2["n_valid"]) >= 1)
    assert np.all(item2["waveform"] == 0)
