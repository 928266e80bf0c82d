"""Whole-pipeline oracle: waveform -> logits vs the reference composition.

Every seam is already proven in isolation (DSP vs float64 oracle in
test_dsp.py, trunk/head vs the torch reference fed spectrograms in
test_full_model_parity.py); this test composes them the way production
does (VERDICT r2 missing #1):

  repo   : waveform buffer + n_valid  ->  jitted make_input_pipeline
           (engine/steps.py:62-109, DSP_PRECISION=HIGHEST; XLA path AND
           Pallas interpret mode)  ->  Flax AudioSlowFast
  oracle : the same real samples  ->  numpy librosa re-expression
           (dsp/reference.py)  ->  edge-pad to NUM_FRAMES
           (audio_loader_epic.py:151-154)  ->  pack_pathway_output
           index_select (datasets/utils.py:43-72)  ->  reference torch
           AudioSlowFast (audio_model_builder.py:311-325), converted weights

Asserts eval softmax scores and train-mode logits agree <= 1e-3 across
short / near / exact-length records, so the n_valid edge-replication
gather, the pathway pack, and the train/eval head asymmetry meet in one
composition — the 0.1% end-to-end north star as a theorem modulo real data.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_shim import load_reference_models

from asf_tpu.checkpoint.pyth_converter import torch_state_to_flax
from asf_tpu.config import get_cfg
from asf_tpu.dsp.reference import log_mel_np, pad_to_num_frames
from asf_tpu.engine.steps import make_input_pipeline
from asf_tpu.models.builders import build_model

RTOL = 1e-3
ATOL = 1e-3

pytestmark = pytest.mark.slow


def _cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "AudioSlowFast"
    cfg.MODEL.NUM_CLASSES = [97, 300]
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.MODEL.PDDL_ATTRIBUTES = ""
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3, 3], [4, 4], [6, 6], [3, 3]]
    cfg.RESNET.FREQUENCY_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.FREQUENCY_DILATIONS = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.DSP_PRECISION = "HIGHEST"
    return cfg


def _records(cfg):
    """(waveform buffer, n_valid) triplet: short / mid / exact-length."""
    clip_size = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS))
    clip_samples = clip_size - 1
    rng = np.random.default_rng(42)
    n_valids = [
        int(0.1 * cfg.AUDIO_DATA.SAMPLING_RATE),  # short: heavy edge-replication
        clip_samples // 2,                        # mid
        clip_samples,                             # exact (long-record slice)
    ]
    waves = np.zeros((len(n_valids), clip_samples), np.float32)
    for i, nv in enumerate(n_valids):
        waves[i, :nv] = (rng.standard_normal(nv) * 0.1).astype(np.float32)
    return waves, np.asarray(n_valids, np.int32), clip_samples


def _oracle_inputs(cfg, waves, n_valids):
    """Reference composition on the same samples -> torch pathway list."""
    specs = []
    for wave, nv in zip(waves, n_valids):
        spec = log_mel_np(cfg, wave[:nv])  # (frames, F) float32
        spec = pad_to_num_frames(spec, cfg.AUDIO_DATA.NUM_FRAMES)
        specs.append(spec)
    fast = torch.tensor(np.stack(specs)[:, None])  # (B, 1, T, F)
    # pack_pathway_output's index_select (datasets/utils.py:58-64)
    t = fast.shape[2]
    idx = torch.linspace(0, t - 1, t // cfg.SLOWFAST.ALPHA).long()
    slow = torch.index_select(fast, 2, idx)
    return [slow, fast]


@pytest.fixture(scope="module")
def oracle_setup():
    cfg = _cfg()
    ref = load_reference_models()
    torch.manual_seed(3)
    tmodel = ref.MODEL_REGISTRY.get("AudioSlowFast")(cfg)
    # non-trivial BN running stats so the eval path is a real check
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0.0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)
    variables = torch_state_to_flax(
        {k: v.detach().clone() for k, v in tmodel.state_dict().items()}
    )
    assert "_skipped_keys" not in variables

    waves, n_valids, _ = _records(cfg)

    # the reference forward mutates its input list in place — fresh list per call
    tmodel.eval()
    with torch.no_grad():
        ev, en = tmodel(_oracle_inputs(cfg, waves, n_valids))
    tmodel.train()
    with torch.no_grad():
        tv, tn = tmodel(_oracle_inputs(cfg, waves, n_valids))
    return cfg, variables, waves, n_valids, (ev, en), (tv, tn)


def _run_repo_pipeline(cfg, variables, waves, n_valids):
    fmodel = build_model(cfg)
    pipeline = make_input_pipeline(cfg)

    @jax.jit
    def eval_fwd(w, nv):
        xs = pipeline(w, nv, None, train=False)
        return fmodel.apply(variables, xs, train=False)

    @jax.jit
    def train_fwd(w, nv):
        xs = pipeline(w, nv, None, train=False)  # no SpecAugment: logit parity
        out, _ = fmodel.apply(variables, xs, train=True, mutable=["batch_stats"])
        return out

    w = jnp.asarray(waves)
    nv = jnp.asarray(n_valids)
    return eval_fwd(w, nv), train_fwd(w, nv)


def _assert_close(got, want, msg):
    np.testing.assert_allclose(
        np.asarray(got), want.detach().numpy(), rtol=RTOL, atol=ATOL, err_msg=msg
    )


def test_waveform_to_logits_oracle_xla(oracle_setup):
    cfg, variables, waves, n_valids, (ev, en), (tv, tn) = oracle_setup
    (fev, fen), (ftv, ftn) = _run_repo_pipeline(cfg, variables, waves, n_valids)
    _assert_close(fev, ev, "eval verb softmax scores")
    _assert_close(fen, en, "eval noun softmax scores")
    _assert_close(ftv, tv, "train verb logits")
    _assert_close(ftn, tn, "train noun logits")


def test_waveform_to_logits_oracle_pallas_interpret(oracle_setup):
    cfg, variables, waves, n_valids, (ev, en), (tv, tn) = oracle_setup
    cfg = cfg.clone()
    cfg.TPU.USE_PALLAS_DSP = True  # interprets off-TPU (ops/logmel_pallas.py:168)
    (fev, fen), (ftv, ftn) = _run_repo_pipeline(cfg, variables, waves, n_valids)
    _assert_close(fev, ev, "eval verb softmax scores (pallas)")
    _assert_close(fen, en, "eval noun softmax scores (pallas)")
    _assert_close(ftv, tv, "train verb logits (pallas)")
    _assert_close(ftn, tn, "train noun logits (pallas)")


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
