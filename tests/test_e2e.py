"""End-to-end smoke tests: train 1 epoch + test, on a 2-device CPU mesh.

Covers the full stack — data -> on-device DSP -> model -> loss -> optimizer ->
checkpoint -> eval/test ensembling — the slice the reference only exercises
in production runs (SURVEY.md §4: "no distributed tests, no fake backends").
"""

import glob
import os

import numpy as np
import pytest

from fixtures import make_epic_fixture, tiny_cfg


@pytest.fixture(scope="module")
def epic_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("epic"))
    make_epic_fixture(root, with_pddl=True)
    return root


def test_train_and_test_slowfast(epic_root, tmp_path):
    from asf_tpu.engine import test as run_test
    from asf_tpu.engine import train as run_train

    cfg = tiny_cfg(epic_root)
    cfg.OUTPUT_DIR = str(tmp_path / "out")

    state = run_train(cfg)
    assert int(state.step) == 1  # 6 records, batch 4, drop_last -> 1 iter

    # checkpoints written: epoch + best
    ckpts = glob.glob(os.path.join(cfg.OUTPUT_DIR, "checkpoints", "*"))
    assert any("checkpoint_epoch_00001" in c for c in ckpts)
    assert any("checkpoint_best" in c for c in ckpts)

    # test phase consumes the saved checkpoint (precedence: last in OUTPUT_DIR)
    results = run_test(cfg)
    (verb_p, noun_p), (verb_l, noun_l), _ = results
    assert verb_p.shape[1] == 6 and noun_p.shape[1] == 8
    assert verb_p.shape[0] == 6  # ensembled over 2 views per record
    # eval path applies softmax then means -> ensembled sums of probabilities
    assert np.all(verb_p >= 0)

    # scores pickle saved
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "scores", "test_scores.pkl"))


def test_train_gru_state(epic_root, tmp_path):
    from asf_tpu.engine import train as run_train

    cfg = tiny_cfg(epic_root, gru=True, pddl=True)
    cfg.OUTPUT_DIR = str(tmp_path / "out_gru")
    cfg.TEST.ENABLE = False

    state = run_train(cfg)
    assert int(state.step) == 1
    # state head appended PDDL attribute count
    assert cfg.MODEL.NUM_CLASSES == [6, 8, 5]


def test_auto_resume(epic_root, tmp_path):
    from asf_tpu.engine import train as run_train

    cfg = tiny_cfg(epic_root)
    cfg.OUTPUT_DIR = str(tmp_path / "out_resume")
    cfg.SOLVER.MAX_EPOCH = 1
    run_train(cfg)

    # second run resumes past epoch 0 and does nothing
    cfg2 = tiny_cfg(epic_root)
    cfg2.OUTPUT_DIR = cfg.OUTPUT_DIR
    cfg2.SOLVER.MAX_EPOCH = 1
    state = run_train(cfg2)
    assert int(state.step) == 0  # no new steps: start_epoch == MAX_EPOCH


def test_train_single_clip_state(epic_root, tmp_path):
    """Non-GRU state head (reference state_head_helper.py:11-143, never
    registered there): AudioSlowFast + EpicKitchensWithPDDL trains with the
    3-way verb/noun/state loss at N=1 windows."""
    from asf_tpu.engine import train as run_train

    cfg = tiny_cfg(epic_root, gru=False, pddl=True)
    cfg.OUTPUT_DIR = str(tmp_path / "out_state")
    cfg.TEST.ENABLE = False

    state = run_train(cfg)
    assert int(state.step) == 1
    assert cfg.MODEL.NUM_CLASSES == [6, 8, 5]
    # state projections exist in the head params
    head = state.params["head"]
    for k in ("projection_min_1", "projection_0", "projection_1"):
        assert k in head, sorted(head)
