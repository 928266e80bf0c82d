"""Epoch re-transfer killers (VERDICT r3 next-step #6).

a) ByteLRUCache — the host-RAM waveform segment cache (data/cache.py):
   bounded byte-LRU semantics, read-only returned arrays, oversized bypass.
b) EpicKitchens + HOST_WAVEFORM_CACHE_MB — items must be BIT-identical with
   the cache on vs off, across epochs (the cache only changes where bytes
   come from, never what they are), and epoch >= 2 must actually hit.
c) DeviceValCache — eval epoch 2 replays the device-resident val set without
   touching the loader, and produces identical epoch stats.

The reference re-reads + re-uploads everything every epoch
(tools/train_net.py:412-422); both caches are repo-only deltas and guard
their own equivalence here.
"""

import numpy as np
import jax
import pytest

from asf_tpu.config import get_cfg
from asf_tpu.data.cache import ByteLRUCache


# ---------------------------------------------------------------- ByteLRU --
def test_byte_lru_basic_and_eviction():
    c = ByteLRUCache(max_bytes=1000)
    a = np.zeros(100, np.int16)  # 200 B each
    for i in range(5):
        c.put(("k", i), a + i)
    assert c.nbytes == 1000 and len(c) == 5
    # touch key 0 -> it becomes MRU; inserting one more evicts key 1 (LRU)
    assert c.get(("k", 0)) is not None
    c.put(("k", 5), a + 5)
    assert c.get(("k", 1)) is None
    assert c.get(("k", 0)) is not None and c.get(("k", 5)) is not None
    assert c.nbytes <= 1000


def test_byte_lru_readonly_and_oversized():
    c = ByteLRUCache(max_bytes=100)
    small = np.arange(10, dtype=np.int16)  # 20 B
    c.put("s", small)
    got = c.get("s")
    with pytest.raises(ValueError):
        got[0] = 7  # read-only view protects later epochs
    np.testing.assert_array_equal(got, small)
    # an entry above the whole budget is bypassed, not cached
    c.put("big", np.zeros(1000, np.int16))
    assert c.get("big") is None
    assert c.get("s") is not None  # and did not evict the resident entries
    # replacing a key under the same name does not leak bytes
    c.put("s", np.arange(20, dtype=np.int16))
    assert c.nbytes == 40


def test_byte_lru_replace_updates_bytes():
    c = ByteLRUCache(max_bytes=200)
    c.put("a", np.zeros(50, np.int16))  # 100 B
    c.put("a", np.zeros(20, np.int16))  # replace -> 40 B, not 140
    assert c.nbytes == 40 and len(c) == 1


# ------------------------------------------- EpicKitchens segment cache ----
def _epic_pair(tmp_path, cache_mb, gru=False, int16=False):
    from fixtures import make_epic_fixture, tiny_cfg
    from asf_tpu.data.epickitchens import EpicKitchens

    root = str(tmp_path)
    make_epic_fixture(root)
    cfg = tiny_cfg(root, gru=gru)
    cfg.TPU.HOST_WAVEFORM_CACHE_MB = cache_mb
    cfg.TPU.INT16_TRANSFER = int16
    return EpicKitchens(cfg, "train")


@pytest.mark.parametrize("gru", [False, True], ids=["regular", "gru"])
def test_epic_segment_cache_bit_identical(tmp_path, gru):
    ds_cold = _epic_pair(tmp_path / "a", 0, gru=gru)
    ds_hot = _epic_pair(tmp_path / "b", 64, gru=gru)
    assert ds_hot._seg_cache is not None and ds_cold._seg_cache is None
    for epoch in (0, 1):
        ds_cold.set_epoch(epoch)
        ds_hot.set_epoch(epoch)
        for i in range(len(ds_cold)):
            a, b = ds_cold[i], ds_hot[i]
            for k in a:
                if k in ("metadata", "label"):
                    continue
                np.testing.assert_array_equal(
                    np.asarray(a[k]), np.asarray(b[k]),
                    err_msg=f"epoch {epoch} item {i} field {k}",
                )
    # second epoch re-reads nothing: every record segment hits
    assert ds_hot._seg_cache.hits >= len(ds_hot)
    assert ds_hot._seg_cache.misses <= len(ds_hot)


def test_epic_segment_cache_int16_wire(tmp_path):
    """Cache entries carry the wire dtype (int16 PCM after a passing probe),
    and stay bit-identical to the uncached reads."""
    ds_cold = _epic_pair(tmp_path / "a", 0, int16=True)
    ds_hot = _epic_pair(tmp_path / "b", 64, int16=True)
    assert ds_cold.int16 == ds_hot.int16  # probe verdict agrees
    for i in range(len(ds_cold)):
        a, b = ds_cold[i], ds_hot[i]
        assert a["waveform"].dtype == b["waveform"].dtype
        np.testing.assert_array_equal(a["waveform"], b["waveform"])


def test_epic_segment_cache_overbudget_disables(tmp_path):
    """A unique-segment working set larger than the budget disables the LRU
    entirely (an over-budget LRU against reshuffled access gets near-zero
    hits, so every miss pays a record-segment read instead of the direct
    clip-sized read); items still assemble via direct reads."""
    from fixtures import make_epic_fixture, tiny_cfg
    from asf_tpu.data.epickitchens import EpicKitchens

    root = str(tmp_path)
    # 16 x 3.0 s + 8 x 0.8 s segments at tiny_cfg's 8 kHz f32 ~= 1.7 MB
    make_epic_fixture(root, video_secs=40.0, n_records=24)
    cfg = tiny_cfg(root)
    cfg.TPU.HOST_WAVEFORM_CACHE_MB = 1
    ds = EpicKitchens(cfg, "train")
    assert ds._cache_working_set_bytes() > 1 << 20  # fixture sanity
    assert ds._seg_cache is None
    assert ds[0]["waveform"].shape == (ds.clip_samples,)
    cfg.TPU.HOST_WAVEFORM_CACHE_MB = 64  # same set, comfortable budget
    assert EpicKitchens(cfg, "train")._seg_cache is not None


def test_epic_int16_probe_verdicts_cached(tmp_path):
    """The 16-bit-PCM-grid probe verdicts are cached per archive: the train /
    val / test constructions of the same HDF5 must not re-read every video's
    head+mid chunks (several constructions per run, ~32 Ki samples each on a
    1-core host)."""
    import os

    import h5py

    from fixtures import make_epic_fixture, tiny_cfg
    from asf_tpu.data import epickitchens as ek

    root = str(tmp_path)
    h5_path, _, _ = make_epic_fixture(root)
    with h5py.File(h5_path, "r+") as f:  # snap samples onto the PCM grid
        for k in f:
            v = np.clip(np.rint(f[k][()] * 32768.0), -32768, 32767) / 32768.0
            f[k][...] = v.astype(np.float32)
    cfg = tiny_cfg(root)
    cfg.TPU.INT16_TRANSFER = True
    ds1 = ek.EpicKitchens(cfg, "train")
    assert ds1.int16
    akeys = [k for k in ek._PCM_GRID_VERDICTS if k[0] == os.path.abspath(h5_path)]
    assert len(akeys) == 1 and all(ek._PCM_GRID_VERDICTS[akeys[0]].values())
    # a second construction must consult the cache, not the file: poison the
    # verdicts and observe the probe trusting them
    for vid in ek._PCM_GRID_VERDICTS[akeys[0]]:
        ek._PCM_GRID_VERDICTS[akeys[0]][vid] = False
    assert not ek.EpicKitchens(cfg, "train").int16


# ------------------------------------------------------ DeviceValCache -----
def _eval_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "AudioSlowFast"
    cfg.MODEL.NUM_CLASSES = [6]
    cfg.MODEL.ARCH = "slowfast"
    cfg.RESNET.DEPTH = 26
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.RESNET.FREQUENCY_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.FREQUENCY_DILATIONS = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.AUDIO_DATA.SAMPLING_RATE = 8000
    cfg.AUDIO_DATA.N_FFT = 256
    cfg.AUDIO_DATA.CLIP_SECS = 0.32
    cfg.AUDIO_DATA.NUM_FRAMES = 64
    cfg.AUDIO_DATA.NUM_FREQUENCIES = 32
    cfg.SLOWFAST.ALPHA = 4
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.DSP_PRECISION = "HIGHEST"
    cfg.TPU.STEPS_PER_DISPATCH = 2
    cfg.TRAIN.DATASET = "Vggsound"
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.LOG_PERIOD = 2
    return cfg


class _Loader(list):
    batch_size = 4


class _PoisonLoader:
    """Iterating this means the replay path touched the loader — fail."""

    batch_size = 4

    def __init__(self, n):
        self._n = n

    def __len__(self):
        return self._n

    def __iter__(self):
        raise AssertionError("device-cache replay must not iterate the loader")


def _mk_batches(rng, clip):
    def mk(b, off):
        return {
            "waveform": (rng.standard_normal((b, clip)) * 0.1).astype(np.float32),
            "n_valid": np.full((b,), clip, np.int32),
            "labels": {"class_id": rng.integers(0, 6, (b,)).astype(np.int32)},
            "index": np.arange(b, dtype=np.int32) + off,
            "metadata": {},
        }

    # 2 macro pairs + ragged tail (pads) — covers both dispatch kinds
    return [mk(4, 0), mk(4, 4), mk(4, 8), mk(4, 12), mk(3, 16)]


def _copies(batches):
    return _Loader(
        [{k: (dict(v) if isinstance(v, dict) else v.copy()) for k, v in b.items()}
         for b in batches]
    )


def test_device_val_cache_replay_matches_streaming():
    from asf_tpu.engine.eval_loop import DeviceValCache, build_val_meter, eval_epoch
    from asf_tpu.engine.steps import (
        init_state,
        make_eval_metrics_step,
        make_eval_multi_step,
    )
    from asf_tpu.models import build_model

    cfg = _eval_cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(3)
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    batches = _mk_batches(rng, clip)

    class _Lazy:
        def init(self, params):
            import optax

            return optax.sgd(0.1).init(params)

    state = init_state(cfg, model, _Lazy(), jax.random.PRNGKey(0), batches[0])
    metrics_step = make_eval_metrics_step(cfg, model)
    multi = make_eval_multi_step(cfg, model)

    cache = DeviceValCache(64 << 20)
    meter_a = build_val_meter(cfg, len(batches))
    _, top1_a = eval_epoch(
        _copies(batches), state, None, meter_a, 0, cfg,
        metrics_step=metrics_step, multi_metrics_step=multi, device_cache=cache,
    )
    assert cache.ready and len(cache.items) == 3  # 2 macros + 1 tail single

    # epoch 2: the loader must never be iterated
    meter_b = build_val_meter(cfg, len(batches))
    _, top1_b = eval_epoch(
        _PoisonLoader(len(batches)), state, None, meter_b, 1, cfg,
        metrics_step=metrics_step, multi_metrics_step=multi, device_cache=cache,
    )
    assert set(top1_a) == set(top1_b)
    for k in top1_a:
        np.testing.assert_allclose(float(top1_a[k]), float(top1_b[k]), err_msg=k)


def test_device_val_cache_budget_overflow_streams():
    from asf_tpu.engine.eval_loop import DeviceValCache, build_val_meter, eval_epoch
    from asf_tpu.engine.steps import (
        init_state,
        make_eval_metrics_step,
        make_eval_multi_step,
    )
    from asf_tpu.models import build_model

    cfg = _eval_cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(4)
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    batches = _mk_batches(rng, clip)

    class _Lazy:
        def init(self, params):
            import optax

            return optax.sgd(0.1).init(params)

    state = init_state(cfg, model, _Lazy(), jax.random.PRNGKey(0), batches[0])
    metrics_step = make_eval_metrics_step(cfg, model)
    multi = make_eval_multi_step(cfg, model)

    cache = DeviceValCache(1024)  # way below one batch
    meter_a = build_val_meter(cfg, len(batches))
    _, top1_a = eval_epoch(
        _copies(batches), state, None, meter_a, 0, cfg,
        metrics_step=metrics_step, multi_metrics_step=multi, device_cache=cache,
    )
    assert cache.disabled and not cache.ready and not cache.items

    # epoch 2 streams again and matches
    meter_b = build_val_meter(cfg, len(batches))
    _, top1_b = eval_epoch(
        _copies(batches), state, None, meter_b, 1, cfg,
        metrics_step=metrics_step, multi_metrics_step=multi, device_cache=cache,
    )
    for k in top1_a:
        np.testing.assert_allclose(float(top1_a[k]), float(top1_b[k]), err_msg=k)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
