"""Golden tests for the fused Pallas log-mel kernel.

Runs in Pallas interpret mode on the CPU test backend; the same kernel
compiles for TPU (exercised by bench.py / __graft_entry__.py). The oracle is
the float64 numpy re-expression of the reference's librosa pipeline
(/root/reference/audio_slowfast/datasets/audio_loader_epic.py:66-97).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from asf_tpu.config import get_cfg
from asf_tpu.dsp import reference as dspref
from asf_tpu.dsp.logmel import LogMelParams, log_mel_spectrogram
from asf_tpu.ops.logmel_pallas import frame_waveform


def _small_cfg(pallas: bool, precision: str = "HIGHEST"):
    cfg = get_cfg()
    cfg.AUDIO_DATA.SAMPLING_RATE = 4000
    cfg.AUDIO_DATA.N_FFT = 256
    cfg.AUDIO_DATA.CLIP_SECS = 0.5
    cfg.AUDIO_DATA.NUM_FRAMES = 120
    cfg.AUDIO_DATA.NUM_FREQUENCIES = 40
    cfg.TPU.USE_PALLAS_DSP = pallas
    cfg.TPU.DSP_PRECISION = precision
    return cfg


def test_frame_waveform_matches_manual_framing():
    rng = np.random.default_rng(0)
    n_fft, hop, t = 64, 12, 30
    s = 300
    wave = rng.standard_normal((2, s)).astype(np.float32)
    frames = np.asarray(frame_waveform(jnp.asarray(wave), t, hop, n_fft))
    padded = np.pad(wave, ((0, 0), (n_fft // 2, n_fft + t * hop)))
    for b in range(2):
        for i in range(t):
            np.testing.assert_array_equal(
                frames[b, i], padded[b, i * hop : i * hop + n_fft]
            )


def test_pallas_logmel_matches_numpy_oracle():
    cfg = _small_cfg(pallas=True)
    p = LogMelParams(cfg)
    rng = np.random.default_rng(1)
    wave = (rng.standard_normal((3, p.clip_samples)) * 0.2).astype(np.float32)

    got = np.asarray(log_mel_spectrogram(jnp.asarray(wave), p))
    want = np.stack(
        [
            dspref.pad_to_num_frames(
                dspref.log_mel_np(cfg, w), cfg.AUDIO_DATA.NUM_FRAMES
            )
            for w in wave
        ]
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pallas_path_matches_xla_path_and_edge_padding():
    """Pallas and pure-XLA paths agree, including the n_valid edge-replicate."""
    cfg_x = _small_cfg(pallas=False)
    cfg_p = _small_cfg(pallas=True)
    px, pp = LogMelParams(cfg_x), LogMelParams(cfg_p)
    rng = np.random.default_rng(2)
    wave = (rng.standard_normal((2, px.clip_samples)) * 0.3).astype(np.float32)
    n_valid = jnp.asarray([px.clip_samples, px.clip_samples // 3], jnp.int32)

    a = np.asarray(log_mel_spectrogram(jnp.asarray(wave), px, n_valid_samples=n_valid))
    b = np.asarray(log_mel_spectrogram(jnp.asarray(wave), pp, n_valid_samples=n_valid))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_pallas_bf16_mode_is_close():
    cfg = _small_cfg(pallas=True, precision="BFLOAT16")
    cfg_ref = _small_cfg(pallas=False)
    pb, pf = LogMelParams(cfg), LogMelParams(cfg_ref)
    assert pb.pallas is not None and pb.fast
    rng = np.random.default_rng(3)
    wave = (rng.standard_normal((2, pb.clip_samples)) * 0.2).astype(np.float32)
    got = np.asarray(log_mel_spectrogram(jnp.asarray(wave), pb))
    want = np.asarray(log_mel_spectrogram(jnp.asarray(wave), pf))
    # bf16 GEMM inputs with fp32 accumulation: coarse but usable tolerance.
    assert np.mean(np.abs(got - want)) < 0.05
    assert np.max(np.abs(got - want)) < 0.6


def test_hopblock_kernel_matches_f32_path():
    """The bf16 hop-block kernel (production geometry: hop 120 -> 128-lane
    blocks, frames rebuilt in VMEM) must match the f32 XLA path to bf16
    tolerance, including n_valid edge replication."""
    cfg = get_cfg()
    cfg.AUDIO_DATA.CLIP_SECS = 0.3  # keep interpret-mode runtime small
    cfg.AUDIO_DATA.NUM_FRAMES = 61
    cfg.TPU.USE_PALLAS_DSP = True
    cfg.TPU.DSP_PRECISION = "BFLOAT16"
    p = LogMelParams(cfg)
    # Narrow trimmed support auto-selects frames-resident; force the
    # hop-block kernel to keep it covered (it remains the production choice
    # for wide-support geometries, e.g. win_length == n_fft).
    assert p.pallas.j_eff == 3 and p.pallas.j_lo == 7
    p.pallas.hopblock = True

    cfg_f = get_cfg()
    cfg_f.AUDIO_DATA.CLIP_SECS = 0.3
    cfg_f.AUDIO_DATA.NUM_FRAMES = 61
    pf = LogMelParams(cfg_f)

    rng = np.random.default_rng(5)
    wave = jnp.asarray((rng.standard_normal((2, p.clip_samples)) * 0.2).astype(np.float32))
    n_valid = jnp.asarray([p.clip_samples, p.clip_samples // 3], jnp.int32)
    got = np.asarray(log_mel_spectrogram(wave, p, n_valid_samples=n_valid))
    want = np.asarray(log_mel_spectrogram(wave, pf, n_valid_samples=n_valid))
    assert np.mean(np.abs(got - want)) < 0.05
    assert np.max(np.abs(got - want)) < 0.6


@pytest.mark.parametrize("batch", [1, 5])
def test_pallas_odd_batch_row_tiling(batch):
    """Row-tile selection must handle batches that don't divide 256."""
    cfg = _small_cfg(pallas=True)
    p = LogMelParams(cfg)
    rng = np.random.default_rng(4)
    wave = (rng.standard_normal((batch, p.clip_samples)) * 0.2).astype(np.float32)
    got = np.asarray(log_mel_spectrogram(jnp.asarray(wave), p))
    want = np.stack(
        [
            dspref.pad_to_num_frames(
                dspref.log_mel_np(cfg, w), cfg.AUDIO_DATA.NUM_FRAMES
            )
            for w in wave
        ]
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_frame_waveform_support_slice_matches_full():
    """support=(s0, s1) emits exactly columns [s0, s1) of the full framing
    (the window-support trim that cuts the DFT contraction is a pure slice)."""
    rng = np.random.default_rng(5)
    n_fft, hop, t = 64, 12, 30
    wave = rng.standard_normal((2, 300)).astype(np.float32)
    full = np.asarray(frame_waveform(jnp.asarray(wave), t, hop, n_fft))
    for s0, s1 in [(25, 39), (0, 64), (13, 14), (50, 64)]:
        part = np.asarray(
            frame_waveform(jnp.asarray(wave), t, hop, n_fft, support=(s0, s1))
        )
        np.testing.assert_array_equal(part, full[:, :, s0:s1])


def test_support_trim_engages_at_production_geometry():
    """Production geometry (win 240 centre-padded into n_fft 2048): the
    kernels must contract over the 256-sample aligned window support and the
    hop-block kernel over 3 blocks, not 18 — with the oracle match unchanged
    (zero basis rows contribute exactly zero; dropping them is bit-identical).
    """
    cfg = get_cfg()  # production defaults: 24 kHz, n_fft 2048, win 240
    cfg.TPU.USE_PALLAS_DSP = True
    cfg.TPU.DSP_PRECISION = "HIGHEST"
    p = LogMelParams(cfg)
    pal = p.pallas
    assert p.support == (905, 1144)
    assert (pal.s0a, pal.s1a, pal.ksup) == (896, 1152, 256)
    assert (pal.j_lo, pal.j_eff) == (7, 3)
    assert pal.w_cos.shape[0] == 256

    rng = np.random.default_rng(7)
    wave = (rng.standard_normal((2, p.clip_samples)) * 0.2).astype(np.float32)
    got = np.asarray(log_mel_spectrogram(jnp.asarray(wave), p))
    want = np.stack(
        [
            dspref.pad_to_num_frames(
                dspref.log_mel_np(cfg, w), max(p.num_frames, 1 + p.clip_samples // p.hop)
            )
            for w in wave
        ]
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # bf16: narrow support -> frames-resident kernel is auto-selected (the
    # hop-block pre-pass saving only pays for wide supports); the trimmed
    # hop-block kernel (j_eff=3) must still match when forced.
    cfg.TPU.DSP_PRECISION = "BFLOAT16"
    p16 = LogMelParams(cfg)
    assert not p16.pallas.hopblock and p16.pallas.j_eff == 3
    got16 = np.asarray(log_mel_spectrogram(jnp.asarray(wave), p16))
    np.testing.assert_allclose(got16, want, rtol=0.3, atol=0.3)
    p16.pallas.hopblock = True
    got_hb = np.asarray(log_mel_spectrogram(jnp.asarray(wave), p16))
    np.testing.assert_allclose(got_hb, want, rtol=0.3, atol=0.3)
