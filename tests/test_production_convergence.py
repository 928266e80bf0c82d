"""Production-numerics convergence smoke (VERDICT r3 missing/weak follow-up).

Every parity test runs f32/HIGHEST; the production policy — bf16 compute
(which switches the stems to the space-to-depth Stride2StemConv,
models/layers.py:147-160), the fused Pallas DSP kernel (interpret mode off
TPU), and the int16 waveform wire — never *trains* anywhere else. This test
trains a tiny SlowFast on separable synthetic audio (one pure tone per
class) for N steps under the production flags and asserts the loss drops
and train top-1 beats chance by a wide margin; the same run at f32/XLA is
the control, so a bf16-policy regression is distinguishable from a test bug.

SpecAugment is off in BOTH runs: the class signal is a single mel bin and
the reference-default mask widths (freq 27 of F=32) erase it at this tiny
geometry — it would test the fixture, not the numerics. The augmentation
path itself is quirk-parity-tested in test_specaugment.py.

The reference trains fp32 only (tools/train_net.py) — this guards the
repo's own production delta, not a reference behaviour.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asf_tpu.config import get_cfg
from asf_tpu.engine.optimizer import construct_optimizer
from asf_tpu.engine.steps import TrainState, init_state, make_train_step
from asf_tpu.models.builders import build_model

pytestmark = pytest.mark.slow

N_STEPS = 40
BATCH = 16
N_CLASSES = 5  # >= 5: the train-step stats compute top-5 (engine/metrics.py)
TONES_HZ = (300.0, 700.0, 1400.0, 2000.0, 2800.0)


def _cfg(production: bool):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "AudioSlowFast"
    cfg.MODEL.NUM_CLASSES = [N_CLASSES, N_CLASSES]
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.ONLY_ACTION_RECOGNITION = True
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.MODEL.PDDL_ATTRIBUTES = ""
    cfg.RESNET.DEPTH = 26
    cfg.RESNET.WIDTH_PER_GROUP = 16
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.RESNET.FREQUENCY_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.FREQUENCY_DILATIONS = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.AUDIO_DATA.SAMPLING_RATE = 8000
    cfg.AUDIO_DATA.N_FFT = 256
    cfg.AUDIO_DATA.CLIP_SECS = 0.32
    cfg.AUDIO_DATA.NUM_FRAMES = 64
    cfg.AUDIO_DATA.NUM_FREQUENCIES = 32
    cfg.SLOWFAST.ALPHA = 4
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.NESTEROV = True
    cfg.SOLVER.WEIGHT_DECAY = 1e-4
    cfg.BN.WEIGHT_DECAY = 0.0
    cfg.TPU.SPEC_AUGMENT = False  # see module docstring
    if production:
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"  # -> Stride2StemConv stems
        cfg.TPU.USE_PALLAS_DSP = True       # interpret mode off-TPU
        cfg.TPU.DSP_PRECISION = "BFLOAT16"
    else:
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.TPU.USE_PALLAS_DSP = False
        cfg.TPU.DSP_PRECISION = "HIGHEST"
    return cfg


def _make_batch(cfg, rng, production: bool):
    """One tone per class + noise; int16 PCM waveforms on the production
    wire (TPU.INT16_TRANSFER semantics: raw samples, /32768 on device)."""
    sr = cfg.AUDIO_DATA.SAMPLING_RATE
    clip_samples = int(round(sr * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    t = np.arange(clip_samples) / sr
    labels = rng.integers(0, N_CLASSES, BATCH)
    waves = np.stack(
        [
            0.5 * np.sin(2 * np.pi * TONES_HZ[c] * t + rng.uniform(0, 2 * np.pi))
            + 0.02 * rng.standard_normal(clip_samples)
            for c in labels
        ]
    ).astype(np.float32)
    if production:
        wf = np.clip(waves * 32768.0, -32768, 32767).astype(np.int16)
    else:
        wf = waves
    return {
        "waveform": jnp.asarray(wf),
        "n_valid": jnp.full((BATCH,), clip_samples, jnp.int32),
        "labels": {
            "verb": jnp.asarray(labels.astype(np.int64)),
            "noun": jnp.asarray(labels.astype(np.int64)),
        },
    }


def _train(production: bool):
    cfg = _cfg(production)
    rng = np.random.default_rng(5 if production else 6)
    model = build_model(cfg)
    example = _make_batch(cfg, rng, production)
    tx_holder = {}

    class _Lazy:
        tx = None

        def init(self, params):
            if self.tx is None:
                self.tx = construct_optimizer(cfg, params)
                tx_holder["tx"] = self.tx
            return self.tx.init(params)

    state = init_state(cfg, model, _Lazy(), jax.random.PRNGKey(0), example)
    step = make_train_step(cfg, model, tx_holder["tx"])

    losses, accs = [], []
    for it in range(N_STEPS):
        batch = _make_batch(cfg, rng, production)
        lr = 0.02 if it < 5 else 0.05  # short warmup keeps bf16 SGD stable
        state, parts, stats = step(state, batch, jnp.float32(lr), jax.random.PRNGKey(1))
        losses.append(float(parts["loss"]))
        accs.append(float(stats["verb_top1"]))
    return losses, accs


@pytest.mark.parametrize("production", [True, False], ids=["bf16-pallas-int16", "f32-control"])
def test_production_policy_trains(production):
    losses, accs = _train(production)
    head = float(np.mean(losses[:5]))
    tail = float(np.mean(losses[-5:]))
    assert np.isfinite(losses).all(), f"non-finite loss: {losses}"
    assert tail < 0.6 * head, f"loss did not decrease: first5={head:.3f} last5={tail:.3f}\n{losses}"
    final_acc = float(np.mean(accs[-5:]))
    assert final_acc > 60.0, (
        f"train top-1 {final_acc:.1f}% does not beat 20% chance by a wide "
        f"margin\nlosses={losses}\naccs={accs}"
    )


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
