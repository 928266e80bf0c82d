"""On-disk ``.pyth`` checkpoint flow, end-to-end (VERDICT r2 missing #2).

Builds the REFERENCE torch AudioSlowFast, torch.saves its ``state_dict()``
to a real ``.pyth`` file with (a) a ``model.`` prefix on every key (the
DDP-style prefix ``CHECKPOINT_CLEAR_NAME_PATTERN`` exists to strip,
reference utils/checkpoint.py:141-152) and (b) one deliberately wrong-shape
head projection, then drives the file through:

  * ``TRAIN.CHECKPOINT_FILE_PATH`` -> ``load_train_checkpoint`` warm-start
    (checkpoint/manager.py:159-183): merged weights, mismatch kept at init,
    epoch offset, ``CHECKPOINT_EPOCH_RESET`` semantics
  * ``TEST.CHECKPOINT_FILE_PATH`` -> ``load_test_checkpoint``
    (manager.py:188-218)

so every line of load_pyth -> clear-name-patterns -> torch_state_to_flax ->
merge_partial executes against an actual file (reference parity:
utils/checkpoint.py:128-203, 281-310).
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from ref_shim import load_reference_models

from asf_tpu.checkpoint import manager as cu
from asf_tpu.checkpoint.pyth_converter import torch_state_to_flax
from asf_tpu.config import get_cfg
from asf_tpu.engine.steps import init_state
from asf_tpu.models.builders import build_model

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
    return cfg


class _Tx:
    def init(self, params):
        return optax.sgd(0.1).init(params)


def _example(cfg, b=1):
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    return {
        "waveform": np.zeros((b, clip), np.float32),
        "n_valid": np.full((b,), clip, np.int32),
    }


@pytest.fixture(scope="module")
def pyth_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pyth")
    cfg = _cfg()
    ref = load_reference_models()
    torch.manual_seed(7)
    tmodel = ref.MODEL_REGISTRY.get("AudioSlowFast")(cfg)
    sd = {k: v.detach().clone() for k, v in tmodel.state_dict().items()}

    # DDP-style prefix on every key + one deliberately mismatched head
    prefixed = {"model." + k: v for k, v in sd.items()}
    prefixed["model.head.projection_verb.weight"] = torch.zeros(5, 2304)

    path = os.path.join(str(tmp), "checkpoint_epoch_00008.pyth")
    torch.save({"epoch": 7, "model_state": prefixed, "cfg": cfg.dump()}, path)

    model = build_model(cfg)
    state = init_state(cfg, model, _Tx(), jax.random.PRNGKey(0), _example(cfg))
    return cfg, sd, path, state


def _get(tree, dotted):
    node = tree
    for k in dotted.split("."):
        node = node[k]
    return np.asarray(node)


def test_pyth_train_warm_start(pyth_setup):
    cfg, sd, path, state = pyth_setup
    cfg = cfg.clone()
    cfg.TRAIN.CHECKPOINT_FILE_PATH = path
    cfg.TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN = ["model."]
    cfg.TRAIN.AUTO_RESUME = False
    cfg.TRAIN.CHECKPOINT_EPOCH_RESET = False

    init_verb_kernel = _get(state.params, "head.projection_verb.kernel").copy()

    import logging

    # Capture on the "asf_tpu" logger directly: setup_logging (run by any
    # earlier CLI/e2e test in the session) sets propagate=False, which makes
    # pytest's root-logger caplog miss these records (order-dependent flake).
    class _Capture(logging.Handler):
        records: list = []

        def emit(self, record):
            self.records.append(record)

    cap = _Capture()
    asf_logger = logging.getLogger("asf_tpu")
    asf_logger.addHandler(cap)
    old_level = asf_logger.level
    asf_logger.setLevel(logging.WARNING)
    try:
        new_state, start_epoch = cu.load_train_checkpoint(cfg, state)
    finally:
        asf_logger.removeHandler(cap)
        asf_logger.setLevel(old_level)

    assert start_epoch == 8  # epoch 7 in the file -> resume at 8

    # merged leaves equal the reference tensors (layout-converted)
    np.testing.assert_array_equal(
        _get(new_state.params, "s1.pathway0_stem.conv.kernel"),
        np.transpose(sd["s1.pathway0_stem.conv.weight"].numpy(), (2, 3, 1, 0)),
    )
    np.testing.assert_array_equal(
        _get(new_state.batch_stats, "s1.pathway1_stem.bn.mean"),
        sd["s1.pathway1_stem.bn.running_mean"].numpy(),
    )
    np.testing.assert_array_equal(
        _get(new_state.params, "head.projection_noun.kernel"),
        np.transpose(sd["head.projection_noun.weight"].numpy(), (1, 0)),
    )
    # the wrong-shape verb head stays at the Flax init values...
    np.testing.assert_array_equal(
        _get(new_state.params, "head.projection_verb.kernel"), init_verb_kernel
    )
    # ...and the mismatch is reported
    assert any(
        "pyth load mismatch" in r.message and "projection_verb" in str(r.args)
        for r in cap.records
    ), [r.getMessage() for r in cap.records][:5]


def test_pyth_epoch_reset(pyth_setup):
    cfg, _, path, state = pyth_setup
    cfg = cfg.clone()
    cfg.TRAIN.CHECKPOINT_FILE_PATH = path
    cfg.TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN = ["model."]
    cfg.TRAIN.AUTO_RESUME = False
    cfg.TRAIN.CHECKPOINT_EPOCH_RESET = True

    new_state, start_epoch = cu.load_train_checkpoint(cfg, state)
    assert start_epoch == 0
    assert int(new_state.step) == 0


def test_pyth_test_checkpoint(pyth_setup):
    cfg, sd, path, state = pyth_setup
    cfg = cfg.clone()
    cfg.TEST.CHECKPOINT_FILE_PATH = path
    cfg.OUTPUT_DIR = "/nonexistent-asf-test"

    # load_test_checkpoint has no clear-pattern hook (reference parity:
    # checkpoint.py:281-310 only strips via the train path), so strip the
    # prefix variant here: re-save without prefix but keep the bad head.
    unprefixed = {k: v for k, v in sd.items()}
    unprefixed["head.projection_verb.weight"] = torch.zeros(5, 2304)
    path2 = path.replace("00008", "00009")
    torch.save({"epoch": 8, "model_state": unprefixed}, path2)
    cfg.TEST.CHECKPOINT_FILE_PATH = path2

    new_state = cu.load_test_checkpoint(cfg, state)
    np.testing.assert_array_equal(
        _get(new_state.params, "s5.pathway0_res2.branch2.c.kernel"),
        np.transpose(sd["s5.pathway0_res2.branch2.c.weight"].numpy(), (2, 3, 1, 0)),
    )
    np.testing.assert_array_equal(
        _get(new_state.batch_stats, "s3_fuse.bn.var"),
        sd["s3_fuse.bn.running_var"].numpy(),
    )


def test_converter_reports_unknown_keys():
    """Keys the converter cannot place surface in _skipped_keys instead of
    vanishing (merge_partial's mismatch-report path, pyth_converter.py:138-171)."""
    out = torch_state_to_flax({"weird.thing.alpha": np.zeros((3, 3, 3))})
    assert out["_skipped_keys"] == ["weird.thing.alpha"]


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
