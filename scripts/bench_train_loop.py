"""Throughput of the REAL `train_epoch` loop — loader threads, device
prefetch, jitted step, meters, LOG_PERIOD-batched host reads — on a
synthetic VGG-Sound dataset at production geometry.

Round-1 VERDICT weak #3: the loop host-synced ~7 floats per step, which
capped the real loop well below the device-only chained-scan bench
(scripts/bench_train.py). This script measures what `train(cfg)` actually
sustains; target is within ~10% of the device-only number.

Usage: ASF_BENCH_BATCH=128 python scripts/bench_train_loop.py
       ASF_BENCH_DATASET=epic python scripts/bench_train_loop.py
         (EPIC-KITCHENS HDF5 loader: int16-native archive + region reads;
          same step compile key as the VGG run, so the persistent cache hits)
       ASF_SMOKE=1 ASF_PLATFORM=cpu ASF_CPU_DEVICES=1 python scripts/bench_train_loop.py
         (tiny geometry on the CPU backend — exercises the exact loader /
          store / fused-gather plumbing this script drives on the TPU, so
          script bugs are caught BEFORE a scarce TPU window; VERDICT r4
          next-step #4 after three r4 sweep slots burned on such bugs)
"""

import os
import time

import numpy as np

from asf_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache

apply_platform_env()  # honour ASF_PLATFORM/ASF_CPU_DEVICES (axon rewrites JAX_PLATFORMS)
enable_compilation_cache()

SMOKE = bool(int(os.environ.get("ASF_SMOKE", "0")))
BATCH = int(os.environ.get("ASF_BENCH_BATCH", 8 if SMOKE else 128))
_K_ENV = int(os.environ.get("ASF_BENCH_K", 0))
N_CLIPS = int(
    os.environ.get(
        "ASF_BENCH_CLIPS", BATCH * (3 * max(_K_ENV, 8) if SMOKE else 32)
    )
)
DATASET = os.environ.get("ASF_BENCH_DATASET", "vgg")
ROOT = f"/tmp/bench_train_loop_{'smoke' if SMOKE else 'v2'}_{DATASET}"


def make_dataset(cfg):
    """Synthetic VGG-Sound: N_CLIPS wavs at the production clip length.

    Every clip is INDEPENDENT noise so no layer of the dispatch relay can
    shortcut repeated payloads — the H2D wire (~50 MB/s, bench_wire.py)
    dominates this loop and must be honestly paid."""
    import pandas as pd
    from scipy.io import wavfile

    audio_dir = os.path.join(ROOT, "audio")
    os.makedirs(audio_dir, exist_ok=True)
    sr = cfg.AUDIO_DATA.SAMPLING_RATE
    n = int(round(sr * cfg.AUDIO_DATA.CLIP_SECS)) + 8
    rng = np.random.default_rng(0)
    rows = []
    for i in range(N_CLIPS):
        name = f"clip{i:05d}.mp4"
        wav = os.path.join(audio_dir, name[:-4] + ".wav")
        if not os.path.exists(wav):
            wavfile.write(wav, sr, (rng.standard_normal(n) * 3000).astype(np.int16))
        rows.append({"video": name, "class_id": int(rng.integers(0, 309))})
    pkl = os.path.join(ROOT, "list.pkl")
    pd.to_pickle(pd.DataFrame(rows), pkl)
    return audio_dir


def make_gru_dataset(cfg):
    """Synthetic EPIC-KITCHENS GRU chains: the standard EpicKitchensGRU
    dataset over an int16 HDF5 archive, segment durations drawn so chains
    span 2..MAX_NB windows (num_spectrograms = ceil((len-ovl)/(clip-ovl)),
    records.py:97). Measures the GRU store-mode real loop that VERDICT r4
    next-step #3 vectorized (window-grid get_refs_batch)."""
    import h5py
    import pandas as pd

    sr = cfg.AUDIO_DATA.SAMPLING_RATE
    video_secs, n_videos = (30.0, 4) if SMOKE else (120.0, 16)
    h5_path = os.path.join(ROOT, "EPIC_audio.hdf5")
    os.makedirs(ROOT, exist_ok=True)
    rng = np.random.default_rng(0)
    if not os.path.exists(h5_path):
        with h5py.File(h5_path, "w") as f:
            for v in range(n_videos):
                pcm = rng.integers(-6000, 6000, int(sr * video_secs), dtype=np.int16)
                f.create_dataset(f"P01_{v:02d}", data=pcm, chunks=(sr * 10,))

    def ts(seconds):
        h, m, s = int(seconds // 3600), int(seconds % 3600 // 60), seconds % 60
        return f"{h:02d}:{m:02d}:{s:05.2f}"

    clip, ovl = cfg.AUDIO_DATA.CLIP_SECS, cfg.AUDIO_DATA.SPECTROGRAM_OVERLAP
    nb_max = int(cfg.AUDIO_DATA.MAX_NB_SPECTROGRAMS)
    rows = []
    for i in range(N_CLIPS):
        nb = int(rng.integers(2, nb_max + 1))
        length = ovl + (clip - ovl) * (nb - 0.5)  # mid-bucket duration
        start = float(rng.uniform(0.0, video_secs - length - (nb_max + 2)))
        rows.append(
            {
                "participant_id": "P01",
                "video_id": f"P01_{i % n_videos:02d}",
                "start_timestamp": ts(start),
                "stop_timestamp": ts(start + length),
                "verb_class": int(rng.integers(0, 97)),
                "noun_class": int(rng.integers(0, 300)),
            }
        )
    pd.DataFrame(rows, index=[f"nar_{i}" for i in range(N_CLIPS)]).to_pickle(
        os.path.join(ROOT, "annotations.pkl")
    )


def make_epic_dataset(cfg):
    """Synthetic EPIC-KITCHENS: int16-native HDF5 archive (wav_to_hdf5
    --int16 layout) + annotation pickle. Records are 2 s segments at random
    offsets in 16 two-minute videos, so every item is a distinct HDF5 region
    read (h5py chunk cache cannot shortcut the work) and the loader ships
    raw PCM under TPU.INT16_TRANSFER.

    The single-task `class_id` record keeps the batch pytree identical to
    the VGG run — same jitted-step compile key, so this measures ONLY the
    loader/wire delta between wav files and HDF5 region reads."""
    import h5py
    import pandas as pd

    from asf_tpu.data.build import register_dataset
    from asf_tpu.data.epickitchens import EpicKitchens
    from asf_tpu.data.records import EpicKitchensAudioRecord

    class _BenchRecord(EpicKitchensAudioRecord):
        @property
        def label(self):
            return {"class_id": int(self._series["verb_class"])}

    @register_dataset("EpicKitchensBench")
    class _EpicBench(EpicKitchens):
        def __init__(self, cfg, mode):
            super().__init__(cfg, mode, record_type=_BenchRecord)

    sr = cfg.AUDIO_DATA.SAMPLING_RATE
    video_secs, n_videos = (30.0, 4) if SMOKE else (120.0, 16)
    h5_path = os.path.join(ROOT, "EPIC_audio.hdf5")
    os.makedirs(ROOT, exist_ok=True)
    rng = np.random.default_rng(0)
    if not os.path.exists(h5_path):
        with h5py.File(h5_path, "w") as f:
            for v in range(n_videos):
                pcm = rng.integers(
                    -6000, 6000, int(sr * video_secs), dtype=np.int16
                )
                f.create_dataset(
                    f"P01_{v:02d}", data=pcm, chunks=(sr * 10,)
                )

    def ts(seconds):
        h, m, s = int(seconds // 3600), int(seconds % 3600 // 60), seconds % 60
        return f"{h:02d}:{m:02d}:{s:05.2f}"

    rows = []
    for i in range(N_CLIPS):
        start = float(rng.uniform(0.0, video_secs - 2.5))
        rows.append(
            {
                "participant_id": "P01",
                "video_id": f"P01_{i % n_videos:02d}",
                "start_timestamp": ts(start),
                "stop_timestamp": ts(start + 2.2),
                "verb_class": int(rng.integers(0, 309)),
                "noun_class": 0,
            }
        )
    pd.DataFrame(rows, index=[f"nar_{i}" for i in range(N_CLIPS)]).to_pickle(
        os.path.join(ROOT, "annotations.pkl")
    )


def main():
    import jax
    import jax.numpy as jnp

    from asf_tpu.config import get_cfg
    from asf_tpu.data.loader import construct_loader
    from asf_tpu.engine.steps import (
        TrainState,
        init_state,
        make_train_multi_step,
        make_train_step,
    )
    from asf_tpu.engine.train_loop import build_train_meter, train_epoch
    from asf_tpu.models import build_model
    from asf_tpu.parallel.mesh import make_mesh, param_shardings, replicate_tree

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "AudioSlowFast"
    cfg.MODEL.NUM_CLASSES = [309]
    cfg.RESNET.DEPTH = 50
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3, 3], [4, 4], [6, 6], [3, 3]]
    cfg.RESNET.FREQUENCY_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.FREQUENCY_DILATIONS = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.USE_PALLAS_DSP = not SMOKE
    cfg.TPU.DSP_PRECISION = "BFLOAT16"
    cfg.TPU.PREFETCH_DEPTH = 2
    cfg.TPU.STEPS_PER_DISPATCH = int(
        os.environ.get("ASF_BENCH_K", cfg.TPU.STEPS_PER_DISPATCH)
    )
    cfg.TRAIN.DATASET = "Vggsound"
    cfg.TRAIN.BATCH_SIZE = BATCH
    cfg.DATA_LOADER.NUM_WORKERS = 2 if SMOKE else 16
    cfg.LOG_PERIOD = 10
    if SMOKE:  # tiny_cfg()-style geometry (tests/fixtures.py) — same code
        # paths (loader modes, store, fused gather, K-scan), toy shapes.
        cfg.AUDIO_DATA.SAMPLING_RATE = 8000
        cfg.AUDIO_DATA.N_FFT = 256
        cfg.AUDIO_DATA.CLIP_SECS = 0.32
        cfg.AUDIO_DATA.NUM_FRAMES = 64
        cfg.AUDIO_DATA.NUM_FREQUENCIES = 32
        cfg.AUDIO_DATA.SPECTROGRAM_OVERLAP = 0.1
        cfg.SLOWFAST.ALPHA = 4
        cfg.RESNET.DEPTH = 26
        cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1, 1], [1, 1], [1, 1], [1, 1]]

    if DATASET == "gru":
        # Production EPIC-GRU geometry at a bounded window cap: batch 32 with
        # up to 4 windows/chain ~= the regular bench's 128 clip-equivalents
        # per step. MODEL/head compile keys differ from the regular bench
        # (GRU head, chain shapes) — its programs warm separately.
        cfg.MODEL.MODEL_NAME = "AudioSlowFastGRU"
        cfg.MODEL.ONLY_ACTION_RECOGNITION = True  # verb/noun heads, no state
        cfg.MODEL.NUM_CLASSES = [97, 300]
        cfg.AUDIO_DATA.MAX_NB_SPECTROGRAMS = 4
        cfg.TRAIN.BATCH_SIZE = BATCH
        make_gru_dataset(cfg)
        cfg.TRAIN.DATASET = "EpicKitchensGRU"
        cfg.EPICKITCHENS.AUDIO_DATA_FILE = os.path.join(ROOT, "EPIC_audio.hdf5")
        cfg.EPICKITCHENS.ANNOTATIONS_DIR = ROOT
        cfg.EPICKITCHENS.PROCESSED_TRAIN_LIST = "annotations.pkl"
    elif DATASET == "epic":
        make_epic_dataset(cfg)
        cfg.TRAIN.DATASET = "EpicKitchensBench"
        cfg.EPICKITCHENS.AUDIO_DATA_FILE = os.path.join(ROOT, "EPIC_audio.hdf5")
        cfg.EPICKITCHENS.ANNOTATIONS_DIR = ROOT
        cfg.EPICKITCHENS.PROCESSED_TRAIN_LIST = "annotations.pkl"
    else:
        audio_dir = make_dataset(cfg)
        cfg.VGGSOUND.AUDIO_DATA_DIR = audio_dir
        cfg.VGGSOUND.ANNOTATIONS_DIR = ROOT
        cfg.VGGSOUND.TRAIN_LIST = "list.pkl"

    mesh = make_mesh(cfg)
    loader = construct_loader(cfg, "train")
    print(f"dataset: {N_CLIPS} clips, {len(loader)} iters/epoch at batch {BATCH}")

    example = next(iter(loader))
    example.pop("metadata", None)

    # Mirror train(cfg): HBM-resident segments + on-device batch assembly,
    # attached AFTER the example batch (init_state needs a real waveform).
    # Both datasets support it now (Epic HDF5 regions, VGG wav files).
    # ASF_BENCH_DEVSTORE=0 forces streaming for an A/B.
    if int(os.environ.get("ASF_BENCH_DEVSTORE", "1")) and int(
        getattr(cfg.TPU, "TRAIN_DEVICE_CACHE_MB", 0)
    ) > 0:
        from asf_tpu.data.device_store import DeviceSegmentStore

        store = DeviceSegmentStore.try_build(
            loader.dataset, int(cfg.TPU.TRAIN_DEVICE_CACHE_MB) << 20, mesh,
            quantum_bytes=int(
                getattr(cfg.TPU, "STORE_CAPACITY_QUANTUM_MB", 0)
            ) << 20,
        )
        if store is not None:
            loader.attach_store(store)
            print(f"device segment store: {store.nbytes / 2**20:.1f} MB resident")

    from asf_tpu.engine.steps import lazy_optimizer

    lazy = lazy_optimizer(cfg)
    rng = jax.random.PRNGKey(0)
    state = init_state(cfg, model := build_model(cfg), lazy, rng, example)
    state = TrainState(
        params=param_shardings(state.params, mesh),
        batch_stats=replicate_tree(state.batch_stats, mesh),
        opt_state=param_shardings(state.opt_state, mesh),
        step=state.step,
    )
    train_step = make_train_step(cfg, model, lazy.tx)
    k = int(cfg.TPU.STEPS_PER_DISPATCH)
    store_obj = getattr(loader, "device_store", None)
    fused = bool(cfg.TPU.FUSED_STORE_GATHER) and store_obj is not None
    multi_step = (
        make_train_multi_step(
            cfg, model, lazy.tx, store=store_obj if fused else None
        )
        if k > 1
        else None
    )
    meter = build_train_meter(cfg, len(loader))
    print(f"STEPS_PER_DISPATCH={k}")

    t0 = time.time()
    state = train_epoch(
        loader, state, train_step, meter, 0, cfg, mesh, rng, multi_step=multi_step
    )
    jax.block_until_ready(state.params)
    print(f"epoch 0 (compile + run): {time.time() - t0:.1f}s")

    for epoch in (1, 2, 3):
        t0 = time.perf_counter()
        state = train_epoch(
            loader, state, train_step, meter, epoch, cfg, mesh, rng,
            multi_step=multi_step,
        )
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
        clips = len(loader) * BATCH
        print(
            f"epoch {epoch}: {dt:.2f}s -> {clips / dt:.0f} clips/s/chip "
            f"({dt / len(loader) * 1e3:.2f} ms/iter, real loop)"
        )

    if multi_step is None:
        return

    # Residency phase: the same dispatch machinery over macros that are
    # ALREADY on device — isolates loop+dispatch cost from this rig's
    # ~55 MB/s H2D wire (PROFILE.md §2). On production hosts (GB/s DMA) the
    # real loop sits at this number.
    from asf_tpu.data.loader import DevicePrefetcher
    from asf_tpu.parallel.mesh import macro_batch_sharding

    ms_sh = macro_batch_sharding(mesh)
    pf = DevicePrefetcher(iter(loader), depth=2, sharding=None,
                          group=k, macro_sharding=ms_sh,
                          store=store_obj, fuse_store=fused)
    macros = []
    for kind, payload, _lr in pf:
        if kind == "macro":
            jax.block_until_ready(payload)
            macros.append(payload)
        if len(macros) == min(3, max(1, len(loader) // k)):
            break
    pf.stop()
    if not macros:
        print("loop-resident phase skipped: loader too small for one macro")
        return
    import jax.numpy as jnp

    n_disp = 12
    lrs = jnp.asarray(np.full((k,), 0.1, np.float32))
    mega = (store_obj.mega,) if fused else ()
    state, _parts, _ = multi_step(state, macros[0], lrs, rng, *mega)  # settle
    float(_parts["loss"][0])
    t0 = time.perf_counter()
    for i in range(n_disp):
        state, parts, stats = multi_step(
            state, macros[i % len(macros)], lrs, rng, *mega
        )
    float(state.step)  # host read: block_until_ready resolves early (relay)
    dt = time.perf_counter() - t0
    clips = n_disp * k * BATCH
    print(
        f"loop-resident (data pre-staged, wire excluded): {clips / dt:.0f} "
        f"clips/s/chip ({dt / (n_disp * k) * 1e3:.2f} ms/iter)"
    )


if __name__ == "__main__":
    main()
