"""Vectorized ref-batch path (asf_tpu/data/fast_rng.py + get_refs_batch).

The device-store loader's remaining host cost was per-item Python —
~45 µs/item of SeedSequence+Generator construction plus thread-pool and
collation overhead (PROFILE.md §0c). The vectorized path must be BIT-
identical to the scalar one: same PCG64 draws (numpy bit_generator.pyx /
pcg64.c re-expressed in vectorized uint64 ops), same floor arithmetic,
same labels/metadata. These tests pin that equivalence; the device-store
suite (test_device_store.py) additionally checks the vectorized batches
against the host __getitem__ collation end-to-end.
"""

import numpy as np
import pytest

from fixtures import make_epic_fixture, make_vgg_fixture, tiny_cfg


def test_bulk_uniform_bit_parity():
    """bulk_first_uniform == item_rng(...).uniform(0, delta) bit-for-bit,
    across seeds/epochs/indices, including delta == 0."""
    from asf_tpu.data.fast_rng import bulk_first_uniform
    from asf_tpu.data.sampling import item_rng

    rng = np.random.default_rng(42)
    for _ in range(4):
        seed = int(rng.integers(0, 2**32))
        epoch = int(rng.integers(0, 50_000))
        idx = rng.integers(0, 2**31, size=129)
        deltas = rng.integers(0, 10**8, size=129).astype(np.float64)
        deltas[:3] = 0.0
        got = bulk_first_uniform(seed, epoch, idx, deltas)
        want = np.array(
            [item_rng(seed, epoch, int(i)).uniform(0, d) for i, d in zip(idx, deltas)]
        )
        np.testing.assert_array_equal(got, want)


def test_bulk_next64_stream_parity():
    """Chained bulk draws track the scalar Generator's next_double stream."""
    from asf_tpu.data.fast_rng import bulk_next64, bulk_pcg64_state
    from asf_tpu.data.sampling import item_rng

    n = 32
    st = bulk_pcg64_state(9, 2, np.arange(n))
    draws = []
    for _ in range(3):
        st, u = bulk_next64(st)
        draws.append((u >> np.uint64(11)).astype(np.float64) / 9007199254740992.0)
    for i in range(n):
        g = item_rng(9, 2, i)
        for k in range(3):
            assert draws[k][i] == g.uniform(0, 1)


def _collate_scalar(ds, store, chunk):
    from asf_tpu.data.device_store import collate_refs

    return collate_refs([ds.get_ref(int(i)) for i in chunk], store)


def _check_batches(got, want):
    __tracebackhide__ = True
    np.testing.assert_array_equal(got["wave_start"], want["wave_start"])
    assert got["wave_start"].dtype == want["wave_start"].dtype
    np.testing.assert_array_equal(got["n_valid"], want["n_valid"])
    assert got["n_valid"].dtype == want["n_valid"].dtype
    np.testing.assert_array_equal(got["index"], want["index"])
    assert set(got["labels"]) == set(want["labels"])
    for k in want["labels"]:
        np.testing.assert_array_equal(got["labels"][k], want["labels"][k])
        assert got["labels"][k].dtype == want["labels"][k].dtype
    assert got["metadata"] == want["metadata"]


@pytest.mark.parametrize("mode", ["train", "test"])
def test_vgg_refs_batch_matches_scalar(tmp_path, mode):
    """Vggsound vectorized offset batches == scalar get_ref collation,
    train (uniform draw) and test (linspace views), across epochs."""
    from asf_tpu.config import get_cfg
    from asf_tpu.data.device_store import DeviceSegmentStore
    from asf_tpu.data.loader import AsfLoader
    from asf_tpu.data.vggsound import Vggsound

    root = str(tmp_path)
    audio_dir, _ = make_vgg_fixture(root, n_clips=7)
    cfg = get_cfg()
    cfg.VGGSOUND.AUDIO_DATA_DIR = audio_dir
    cfg.VGGSOUND.ANNOTATIONS_DIR = root
    cfg.VGGSOUND.TRAIN_LIST = cfg.VGGSOUND.TEST_LIST = "test.pkl"
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 3
    ds = Vggsound(cfg, mode)
    store = DeviceSegmentStore.try_build(ds, 64 << 20, mesh=None)
    assert store is not None

    ld = AsfLoader(ds, batch_size=4, shuffle=(mode == "train"),
                   drop_last=False, num_workers=2, seed=0)
    ld.attach_store(store)
    for epoch in (0, 2):
        ld.set_epoch(epoch)
        idx = ld._indices()
        for b in range(len(ld)):
            chunk = idx[b * 4 : (b + 1) * 4]
            got = ld._refs_batch_vec(chunk)
            assert got is not None, "vectorized path must be taken"
            _check_batches(got, _collate_scalar(ds, store, chunk))


@pytest.mark.parametrize("mode", ["train", "test"])
def test_epic_refs_batch_matches_scalar(tmp_path, mode):
    """EpicKitchens regular records: vectorized == scalar, both modes,
    including short records (n_valid < clip_samples)."""
    from asf_tpu.data.device_store import DeviceSegmentStore
    from asf_tpu.data.epickitchens import EpicKitchens
    from asf_tpu.data.loader import AsfLoader

    root = str(tmp_path)
    make_epic_fixture(root)
    cfg = tiny_cfg(root)
    cfg.TPU.HOST_WAVEFORM_CACHE_MB = 0
    ds = EpicKitchens(cfg, mode)
    store = DeviceSegmentStore.try_build(ds, 64 << 20, mesh=None)
    assert store is not None

    ld = AsfLoader(ds, batch_size=3, shuffle=(mode == "train"),
                   drop_last=False, num_workers=2, seed=cfg.RNG_SEED)
    ld.attach_store(store)
    short = [i for i in range(len(ds))
             if ds._audio_records[i].num_audio_samples < ds.clip_size]
    for epoch in (0, 1):
        ld.set_epoch(epoch)
        idx = ld._indices()
        for b in range(len(ld)):
            chunk = idx[b * 3 : (b + 1) * 3]
            got = ld._refs_batch_vec(chunk)
            assert got is not None, "vectorized path must be taken"
            _check_batches(got, _collate_scalar(ds, store, chunk))
    if short:  # exercise the short-record branch explicitly
        chunk = np.asarray(short[:3])
        _check_batches(
            ld._refs_batch_vec(chunk), _collate_scalar(ds, store, chunk)
        )


@pytest.mark.parametrize("single_bucket", [False, True])
def test_gru_refs_batch_matches_scalar(tmp_path, single_bucket):
    """GRU chains: the vectorized offset-grid batches (deterministic window
    placement, no rng — VERDICT r4 next-step #3) must equal
    ``collate_refs([get_ref(i) ...])`` bit-for-bit: window-count bucketing,
    the off<0 zero-pad sentinels, the in-video n_valid rule, lengths and
    noun embeddings, across shuffled epochs."""
    from asf_tpu.data.device_store import DeviceSegmentStore, collate_refs
    from asf_tpu.data.epickitchens import EpicKitchensGRU
    from asf_tpu.data.loader import AsfLoader

    root = str(tmp_path)
    make_epic_fixture(root)
    cfg = tiny_cfg(root, gru=True)
    cfg.TPU.HOST_WAVEFORM_CACHE_MB = 0
    ds = EpicKitchensGRU(cfg, "train")
    store = DeviceSegmentStore.try_build(ds, 64 << 20, mesh=None)
    assert store is not None
    nbmax = cfg.AUDIO_DATA.MAX_NB_SPECTROGRAMS
    ld = AsfLoader(ds, batch_size=2, shuffle=True, drop_last=False,
                   num_workers=2, seed=cfg.RNG_SEED, max_windows=nbmax,
                   single_bucket=single_bucket)
    ld.attach_store(store)
    for epoch in (0, 1):
        ld.set_epoch(epoch)
        idx = ld._indices()
        for b in range(len(ld)):
            chunk = idx[b * 2 : (b + 1) * 2]
            got = ld._refs_batch_vec(chunk)
            assert got is not None, "vectorized path must be taken"
            want = collate_refs(
                [ds.get_ref(int(i)) for i in chunk], store, nbmax,
                single_bucket,
            )
            _check_batches(got, want)
            np.testing.assert_array_equal(got["lengths"], want["lengths"])
            assert got["lengths"].dtype == want["lengths"].dtype
            assert ("noun_embedding" in got) == ("noun_embedding" in want)
            if "noun_embedding" in want:
                np.testing.assert_array_equal(
                    got["noun_embedding"], want["noun_embedding"]
                )


def test_empty_dataset_falls_back(tmp_path):
    """Zero-record datasets return None from get_refs_batch instead of
    crashing on undefined label/metadata schemas (ADVICE r4 #3)."""
    from asf_tpu.data.epickitchens import EpicKitchens, EpicKitchensGRU

    root = str(tmp_path)
    make_epic_fixture(root)
    cfg = tiny_cfg(root)
    cfg.TPU.HOST_WAVEFORM_CACHE_MB = 0
    for klass, gru in ((EpicKitchens, False), (EpicKitchensGRU, True)):
        c = tiny_cfg(root, gru=gru)
        c.TPU.HOST_WAVEFORM_CACHE_MB = 0
        ds = klass(c, "train")
        ds._audio_records = []
        ds._ref_tables = ds._gru_ref_tables = None  # rebuild over the empty list
        assert ds.get_refs_batch(np.asarray([], np.int64)) is None
        assert ds.ref_seg_keys() is None


def test_exotic_seed_falls_back(tmp_path):
    """Seeds outside uint32 (or negative epochs) disable the vectorized path
    instead of silently diverging from the scalar Generator derivation."""
    from asf_tpu.config import get_cfg
    from asf_tpu.data.vggsound import Vggsound

    root = str(tmp_path)
    audio_dir, _ = make_vgg_fixture(root)
    cfg = get_cfg()
    cfg.VGGSOUND.AUDIO_DATA_DIR = audio_dir
    cfg.VGGSOUND.ANNOTATIONS_DIR = root
    cfg.VGGSOUND.TRAIN_LIST = "test.pkl"
    cfg.RNG_SEED = 2**40
    ds = Vggsound(cfg, "train")
    assert ds.get_refs_batch(np.arange(2)) is None


def test_out_of_range_indices_raise():
    """Indices outside uint32 must raise, not silently wrap: the scalar
    SeedSequence raises for negatives and SPLITS >=2**32 ints into two
    entropy words, so a uint32 cast would diverge bit-wise (ADVICE r4 #1)."""
    from asf_tpu.data.fast_rng import bulk_pcg64_state

    with pytest.raises(ValueError, match="indices outside uint32"):
        bulk_pcg64_state(1, 0, np.asarray([0, -1], np.int64))
    with pytest.raises(ValueError, match="indices outside uint32"):
        bulk_pcg64_state(1, 0, np.asarray([2**32], np.int64))
    # In-range boundary values still vectorize.
    s_hi, s_lo, _, _ = bulk_pcg64_state(1, 0, np.asarray([0, 2**32 - 1], np.int64))
    assert s_hi.shape == s_lo.shape == (2,)


def test_heterogeneous_label_keys_raise(tmp_path):
    """Records whose label/metadata schemas differ cannot batch — the table
    builder must fail loudly instead of KeyError/ragged-stack later
    (ADVICE r4 #3)."""
    from asf_tpu.data.epickitchens import EpicKitchens

    root = str(tmp_path)
    make_epic_fixture(root)
    cfg = tiny_cfg(root)
    cfg.TPU.HOST_WAVEFORM_CACHE_MB = 0
    ds = EpicKitchens(cfg, "train")

    class OddRecord:
        """Wraps a real record but reports a divergent label schema."""

        def __init__(self, rec):
            self._rec = rec

        def __getattr__(self, name):
            return getattr(self._rec, name)

        @property
        def label(self):
            return {"weird_key": 0}

    assert len(ds._audio_records) >= 2
    ds._audio_records[1] = OddRecord(ds._audio_records[1])
    ds._ref_tables = None
    with pytest.raises(ValueError, match="keys differ"):
        ds.get_refs_batch(np.arange(2))
