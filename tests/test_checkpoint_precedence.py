"""Test-time checkpoint precedence (reference utils/checkpoint.py:281-310):
TEST.CHECKPOINT_FILE_PATH > last checkpoint in OUTPUT_DIR > TRAIN path >
random init."""

import jax.numpy as jnp
import numpy as np

from asf_tpu.checkpoint import manager as cu
from asf_tpu.config import get_cfg
from asf_tpu.engine.steps import TrainState


def _mini_state(val: float):
    return TrainState(
        params={"head": {"w": jnp.full((2, 2), val)}},
        batch_stats={"bn": {"mean": jnp.zeros((2,))}},
        opt_state=None,
        step=jnp.zeros((), jnp.int32),
    )


def test_get_last_checkpoint_ordering(tmp_path):
    cfg = get_cfg()
    out = str(tmp_path / "job")
    cu.save_checkpoint(out, _mini_state(1.0), 0, cfg)
    cu.save_checkpoint(out, _mini_state(2.0), 3, cfg)
    last = cu.get_last_checkpoint(out)
    assert last is not None and "00004" in last  # epoch+1 naming


def test_test_checkpoint_precedence(tmp_path):
    cfg = get_cfg()
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    path_a = cu.save_checkpoint(out_a, _mini_state(5.0), 0, cfg)
    cu.save_checkpoint(out_b, _mini_state(7.0), 0, cfg)

    # 1) explicit TEST path wins over OUTPUT_DIR contents
    cfg.TEST.CHECKPOINT_FILE_PATH = path_a
    cfg.OUTPUT_DIR = out_b
    state = cu.load_test_checkpoint(cfg, _mini_state(0.0))
    assert float(np.asarray(state.params["head"]["w"])[0, 0]) == 5.0

    # 2) otherwise the last checkpoint in OUTPUT_DIR
    cfg.TEST.CHECKPOINT_FILE_PATH = ""
    state = cu.load_test_checkpoint(cfg, _mini_state(0.0))
    assert float(np.asarray(state.params["head"]["w"])[0, 0]) == 7.0

    # 3) otherwise TRAIN.CHECKPOINT_FILE_PATH
    cfg.OUTPUT_DIR = str(tmp_path / "empty")
    cfg.TRAIN.CHECKPOINT_FILE_PATH = path_a
    state = cu.load_test_checkpoint(cfg, _mini_state(0.0))
    assert float(np.asarray(state.params["head"]["w"])[0, 0]) == 5.0

    # 4) otherwise random init (state returned unchanged)
    cfg.TRAIN.CHECKPOINT_FILE_PATH = ""
    state = cu.load_test_checkpoint(cfg, _mini_state(0.25))
    assert float(np.asarray(state.params["head"]["w"])[0, 0]) == 0.25
