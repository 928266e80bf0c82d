"""Golden tests: on-device JAX log-mel vs the numpy librosa-semantics reference.

The numpy reference (asf_tpu/dsp/reference.py) re-expresses the exact librosa
call chain of /root/reference/audio_slowfast/datasets/audio_loader_epic.py:66-97.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from asf_tpu.config import get_cfg
from asf_tpu.dsp import mel as melmod
from asf_tpu.dsp import reference as ref
from asf_tpu.dsp.logmel import LogMelParams, log_mel_spectrogram, num_frames_for
from asf_tpu.dsp.pathways import pack_pathways, slow_indices


def _rand_wave(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def _small_cfg():
    """Small DSP geometry — same math, fast CPU compiles."""
    cfg = get_cfg()
    cfg.AUDIO_DATA.SAMPLING_RATE = 8000
    cfg.AUDIO_DATA.N_FFT = 512
    cfg.AUDIO_DATA.NUM_FREQUENCIES = 40
    cfg.AUDIO_DATA.CLIP_SECS = 0.5
    cfg.AUDIO_DATA.NUM_FRAMES = 100
    return cfg


@functools.partial(jax.jit, static_argnums=(1,))
def _logmel_jit(wave, params, n_valid=None):
    return log_mel_spectrogram(wave, params, n_valid)


def test_stft_params_quirk():
    """win=10ms hop=5ms at 24kHz -> effective hop = win - hop = 120 samples
    (reference quirk at audio_loader_epic.py:74-75)."""
    cfg = get_cfg()
    win, hop = ref.stft_params(cfg)
    assert win == 240
    assert hop == 120


def test_frame_geometry():
    cfg = get_cfg()
    # CLIP_SECS=1.279 @ 24k -> clip_size 30696, sliced clip 30695 samples -> 256 frames
    p = LogMelParams(cfg)
    assert p.clip_samples == 30695
    assert num_frames_for(p.clip_samples, p.hop) == 256 == cfg.AUDIO_DATA.NUM_FRAMES
    # SLOWFAST_R50.yaml: CLIP_SECS=1.999 -> 400 frames
    cfg2 = get_cfg()
    cfg2.AUDIO_DATA.CLIP_SECS = 1.999
    cfg2.AUDIO_DATA.NUM_FRAMES = 400
    p2 = LogMelParams(cfg2)
    assert num_frames_for(p2.clip_samples, p2.hop) == 400


def test_mel_filterbank_properties():
    W = melmod.mel_filterbank(24000, 2048, 128)
    assert W.shape == (128, 1025)
    assert (W >= 0).all()
    # HTK mel band centres are monotonically increasing in frequency.
    centers = W.argmax(axis=1)
    assert (np.diff(centers) >= 0).all()
    # norm=None: peak of each triangle is 1 at its centre bin neighbourhood
    assert W.max() <= 1.0 + 1e-6


def test_logmel_matches_numpy_reference_full_geometry():
    """Production geometry (24 kHz, n_fft 2048, 256x128) golden test."""
    cfg = get_cfg()
    p = LogMelParams(cfg)
    wave = _rand_wave(p.clip_samples)

    golden = ref.log_mel_np(cfg, wave)  # (T, n_mels)
    assert golden.shape == (256, 128)

    got = np.asarray(_logmel_jit(jnp.asarray(wave[None]), p))[0]
    assert got.shape == (256, 128)
    # Silence-floor bins amplify fp32 rounding through the log; librosa's own
    # fp32 pipeline drifts comparably. Bound the error in mel (linear) domain
    # relative to the per-frame peak, plus a loose log-domain cap.
    mel_got, mel_gold = np.exp(got.astype(np.float64)), np.exp(golden.astype(np.float64))
    peak = mel_gold.max(axis=1, keepdims=True)
    np.testing.assert_array_less(np.abs(mel_got - mel_gold) / peak, 5e-3)
    assert np.median(np.abs(got - golden)) < 1e-3


def test_logmel_small_geometry_tight():
    cfg = _small_cfg()
    p = LogMelParams(cfg)
    waves = np.stack([_rand_wave(p.clip_samples, seed=s) for s in range(3)])
    got = np.asarray(_logmel_jit(jnp.asarray(waves), p))
    assert got.shape == (3, 100, 40)
    for i in range(3):
        golden = ref.log_mel_np(cfg, waves[i])
        np.testing.assert_allclose(got[i], golden, rtol=1e-3, atol=1e-3)


def test_logmel_edge_padding_short_record():
    """Short record: zero-pad waveform on host, pass n_valid; result must equal
    the reference flow (short STFT then np.pad edge to NUM_FRAMES)."""
    cfg = _small_cfg()
    p = LogMelParams(cfg)
    n_valid = 1600  # 0.2 s record at 8 kHz
    short = _rand_wave(n_valid, seed=1)

    golden = ref.pad_to_num_frames(ref.log_mel_np(cfg, short), cfg.AUDIO_DATA.NUM_FRAMES)

    padded = np.zeros(p.clip_samples, dtype=np.float32)
    padded[:n_valid] = short
    got = np.asarray(
        _logmel_jit(jnp.asarray(padded[None]), p, jnp.asarray([n_valid]))
    )[0]
    np.testing.assert_allclose(got, golden, rtol=1e-3, atol=1e-3)


def test_slow_indices_torch_parity():
    """floor(linspace) must match torch.linspace(0, T-1, T//alpha).long()."""
    import torch

    for T, alpha in [(400, 4), (256, 8), (100, 4)]:
        want = torch.linspace(0, T - 1, T // alpha).long().numpy()
        got = slow_indices(T, alpha)
        np.testing.assert_array_equal(got, want)


def test_pack_pathways_shapes():
    cfg = get_cfg()
    cfg.AUDIO_DATA.NUM_FRAMES = 400
    cfg.SLOWFAST.ALPHA = 4
    spec = jnp.zeros((2, 400, 128, 1))
    slow, fast = pack_pathways(cfg, spec)
    assert slow.shape == (2, 100, 128, 1)
    assert fast.shape == (2, 400, 128, 1)

    cfg.MODEL.ARCH = "slow"
    (only,) = pack_pathways(cfg, spec)
    assert only.shape == (2, 400, 128, 1)


def test_slow_indices_bit_match_torch_linspace():
    """slow_indices must equal torch.linspace(0, T-1, T//alpha).long() for
    EVERY geometry (the float64 np.linspace it replaced diverged at 611 of
    these, including T=400 at the defaults.py ALPHA=8)."""
    import torch

    from asf_tpu.dsp.pathways import slow_indices

    for t in range(2, 1200, 7):
        for alpha in (2, 3, 4, 5, 8, 16):
            n = t // alpha
            if n < 1:
                continue
            want = torch.linspace(0, t - 1, n).long().numpy()
            got = np.asarray(slow_indices(t, alpha))
            np.testing.assert_array_equal(got, want, err_msg=f"T={t} alpha={alpha}")
    # the production geometries explicitly
    for t, alpha in ((400, 4), (400, 8), (64, 4)):
        want = torch.linspace(0, t - 1, t // alpha).long().numpy()
        np.testing.assert_array_equal(slow_indices(t, alpha), want)
