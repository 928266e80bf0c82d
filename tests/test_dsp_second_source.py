"""Independent second source for the DSP oracle (VERDICT round-1 missing #3).

The golden tests in test_dsp.py compare the on-device front end to
asf_tpu/dsp/reference.py — a self-authored numpy re-expression of librosa's
pipeline (/root/reference/audio_slowfast/datasets/audio_loader_epic.py:66-97).
librosa itself is not installed, so a bug shared by oracle and kernel would
pass. This module closes the loop with scipy (independently implemented and
installed):

  * scipy.signal.stft with librosa-matched centering (boundary='zeros' pads
    nperseg//2 like center=True), the centre-padded periodic Hann window, and
    the win.sum() de-scaling scipy applies.
  * an np.interp-based HTK triangular filterbank — the same published
    formula expressed through a different construction than
    asf_tpu/dsp/mel.py's vectorised ramps.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal

from asf_tpu.config import get_cfg
from asf_tpu.dsp import mel as melmod
from asf_tpu.dsp import reference as ref
from asf_tpu.dsp.logmel import LogMelParams, log_mel_spectrogram


def scipy_stft_magnitude(audio, n_fft, win_length, hop_length):
    """|STFT| with librosa semantics via scipy.signal.stft."""
    w = melmod.padded_window(win_length, n_fft)
    _, _, Z = signal.stft(
        np.asarray(audio, np.float64),
        window=w,
        nperseg=n_fft,
        noverlap=n_fft - hop_length,
        boundary="zeros",
        padded=False,
        detrend=False,
        return_onesided=True,
    )
    return np.abs(Z) * w.sum()  # undo scipy's 1/win.sum() scaling


def interp_mel_filterbank(sr, n_fft, n_mels, fmin=0.0, fmax=None):
    """HTK mel triangles via np.interp, one filter at a time."""
    if fmax is None:
        fmax = sr / 2.0
    hz2mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)  # noqa: E731
    mel2hz = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)  # noqa: E731
    edges = mel2hz(np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2))
    freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    W = np.zeros((n_mels, len(freqs)))
    for m in range(n_mels):
        left, center, right = edges[m], edges[m + 1], edges[m + 2]
        W[m] = np.interp(freqs, [left, center, right], [0.0, 1.0, 0.0])
        W[m][(freqs <= left) | (freqs >= right)] = 0.0
    return W


def scipy_log_mel(cfg, audio, eps=1e-6):
    """Full second-source chain: audio -> (frames, n_mels) float64 log-mel."""
    win, hop = ref.stft_params(cfg)
    mag = scipy_stft_magnitude(audio, cfg.AUDIO_DATA.N_FFT, win, hop)
    W = interp_mel_filterbank(
        cfg.AUDIO_DATA.SAMPLING_RATE, cfg.AUDIO_DATA.N_FFT, cfg.AUDIO_DATA.NUM_FREQUENCIES
    )
    return np.log(W @ mag + eps).T


def _rand_wave(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def test_stft_oracle_vs_scipy_production_geometry():
    cfg = get_cfg()  # 24 kHz, n_fft 2048, win 240, effective hop 120
    win, hop = ref.stft_params(cfg)
    wave = _rand_wave(int(24000 * 1.279))
    mine = ref.stft_magnitude_np(wave, cfg.AUDIO_DATA.N_FFT, win, hop)
    scp = scipy_stft_magnitude(wave, cfg.AUDIO_DATA.N_FFT, win, hop)
    n = min(mine.shape[1], scp.shape[1])
    assert n >= mine.shape[1]  # scipy covers at least the oracle's frames
    np.testing.assert_allclose(mine, scp[:, : mine.shape[1]], atol=1e-12)


def test_stft_oracle_vs_scipy_non_default_hop():
    """Geometry where win != 2*hop, so the hop quirk actually changes hop."""
    n_fft, win, hop_ms = 512, 200, 60  # quirk: effective hop = 200 - 60 = 140
    hop = win - 60
    wave = _rand_wave(8000, seed=3)
    mine = ref.stft_magnitude_np(wave, n_fft, win, hop)
    scp = scipy_stft_magnitude(wave, n_fft, win, hop)
    np.testing.assert_allclose(mine, scp[:, : mine.shape[1]], atol=1e-12)


def test_mel_filterbank_vs_interp_construction():
    for sr, n_fft, n_mels in [(24000, 2048, 128), (8000, 512, 40)]:
        a = melmod.mel_filterbank(sr, n_fft, n_mels).astype(np.float64)
        b = interp_mel_filterbank(sr, n_fft, n_mels)
        np.testing.assert_allclose(a, b, atol=1e-7)


def test_logmel_oracle_vs_scipy_chain():
    cfg = get_cfg()
    wave = _rand_wave(30695, seed=7)
    golden = ref.log_mel_np(cfg, wave)  # float32 oracle
    second = scipy_log_mel(cfg, wave)[: golden.shape[0]]
    np.testing.assert_allclose(golden, second, rtol=1e-4, atol=1e-4)


def test_on_device_logmel_vs_scipy_chain():
    """The jitted kernel against the NON-self-referential golden."""
    cfg = get_cfg()
    cfg.AUDIO_DATA.SAMPLING_RATE = 8000
    cfg.AUDIO_DATA.N_FFT = 512
    cfg.AUDIO_DATA.NUM_FREQUENCIES = 40
    cfg.AUDIO_DATA.CLIP_SECS = 0.5
    cfg.AUDIO_DATA.NUM_FRAMES = 100
    p = LogMelParams(cfg)
    wave = _rand_wave(p.clip_samples, seed=11)

    fn = functools.partial(jax.jit, static_argnums=(1,))(log_mel_spectrogram)
    got = np.asarray(fn(jnp.asarray(wave[None]), p))[0]
    second = scipy_log_mel(cfg, wave)[: got.shape[0]]
    np.testing.assert_allclose(got, second, rtol=1e-3, atol=1e-3)
