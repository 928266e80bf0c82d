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

    # epoch checkpoint written. (checkpoint_best is data-dependent: the
    # reference's is_best is strict `>` vs max_top1_acc=0.0, so an untrained
    # tiny model with val action-top1 == 0 legitimately writes none — the
    # decision logic is unit-tested in test_meters.py.)
    ckpts = glob.glob(os.path.join(cfg.OUTPUT_DIR, "checkpoints", "*"))
    assert any("checkpoint_epoch_00001" in c for c in ckpts)

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

    # second run resumes past epoch 0 and does nothing — but the restored
    # step counter carries over (round-1 weak #4: a resumed run replayed the
    # epoch-0 SpecAugment/dropout rng stream because step reset to 0)
    cfg2 = tiny_cfg(epic_root)
    cfg2.OUTPUT_DIR = cfg.OUTPUT_DIR
    cfg2.SOLVER.MAX_EPOCH = 1
    state = run_train(cfg2)
    assert int(state.step) == 1  # restored from the checkpoint, no new steps

    # extended schedule: resumes at epoch 1 and CONTINUES the step counter,
    # so the train step's fold_in(rng, step) draws a fresh augmentation
    # stream rather than replaying step 0's
    cfg3 = tiny_cfg(epic_root)
    cfg3.OUTPUT_DIR = cfg.OUTPUT_DIR
    cfg3.SOLVER.MAX_EPOCH = 2
    state = run_train(cfg3)
    assert int(state.step) == 2


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


def test_train_and_test_vggsound(tmp_path):
    """Single-task VGG-Sound path: wav loader -> single-head model -> train ->
    TestMeter ensembling + mAP/AUC/d' stats (vggsound_metrics.py parity)."""
    from fixtures import make_vgg_fixture, tiny_cfg

    root = str(tmp_path / "vgg")
    audio_dir, pkl = make_vgg_fixture(root, sr=8000, n_clips=6, clip_secs=0.6)

    cfg = tiny_cfg(root)  # reuse tiny geometry, then re-point at VGG-Sound
    cfg.TRAIN.DATASET = "Vggsound"
    cfg.TEST.DATASET = "Vggsound"
    cfg.VGGSOUND.AUDIO_DATA_DIR = audio_dir
    cfg.VGGSOUND.ANNOTATIONS_DIR = root
    cfg.VGGSOUND.TRAIN_LIST = "test.pkl"
    cfg.VGGSOUND.VAL_LIST = "test.pkl"
    cfg.VGGSOUND.TEST_LIST = "test.pkl"
    cfg.MODEL.NUM_CLASSES = [6]
    cfg.OUTPUT_DIR = str(tmp_path / "out_vgg")
    cfg.TEST.ENABLE = True

    from asf_tpu.engine import test as run_test
    from asf_tpu.engine import train as run_train

    state = run_train(cfg)
    assert int(state.step) == 1

    preds, labels = run_test(cfg)
    assert preds.shape == (6, 6)  # 6 clips ensembled over 2 views
    assert np.all(preds >= 0)  # eval softmax then ensemble-sum


def test_train_tensor_parallel_mesh(epic_root, tmp_path):
    """DP x TP: 2x2 (data, model) mesh — wide conv/dense kernels shard on
    'model', GSPMD inserts the collectives (reference has no TP; SURVEY §2.6)."""
    from asf_tpu.engine import train as run_train
    from asf_tpu.parallel.mesh import make_mesh

    cfg = tiny_cfg(epic_root)
    cfg.OUTPUT_DIR = str(tmp_path / "out_tp")
    cfg.TEST.ENABLE = False
    cfg.TPU.DATA_PARALLEL = 2
    cfg.TPU.MODEL_PARALLEL = 2

    mesh = make_mesh(cfg)
    assert mesh.axis_names == ("data", "model") and mesh.devices.shape == (2, 2)

    state = run_train(cfg)
    assert int(state.step) == 1
    # a wide kernel actually sharded over 'model'
    import jax
    leaves = [x for x in jax.tree.leaves(state.params) if hasattr(x, "sharding")]
    assert any(
        "model" in (x.sharding.spec[-1] or "") if x.sharding.spec else False
        for x in leaves
        if getattr(x, "ndim", 0) >= 2
    ), "no parameter ended up model-sharded"


def test_slide_test_engine(epic_root, tmp_path):
    """Sliding-window evaluation through the full test engine: slide dataset
    -> eval forward -> EPICTestMeterSlide window-weighted multi-label
    accuracy (reference perform_test_slide, tools/test_net.py:206-383)."""
    from asf_tpu.engine import test as run_test

    cfg = tiny_cfg(epic_root)
    cfg.OUTPUT_DIR = str(tmp_path / "out_slide")
    cfg.TEST.ENABLE = True
    cfg.TEST.DATASET = "EpicKitchensSlide"
    cfg.TEST.SLIDE.ENABLE = True
    cfg.TEST.SLIDE.WIN_SIZE = 0.32
    cfg.TEST.SLIDE.HOP_SIZE = 0.32
    cfg.TEST.SLIDE.LABEL_FRAME = 0.5
    cfg.TEST.SLIDE.INSIDE_ACTION_BOUNDS = False
    cfg.TEST.SLIDE.PER_ACTION_INSTANCE = False
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1

    results = run_test(cfg)
    assert results is not None
    (verb_p, noun_p), (verb_l, noun_l), _ = results
    assert verb_p.shape[1] == 6 and noun_p.shape[1] == 8
    assert verb_l.shape[1] == 4  # MAX_OVERLAP multi-label slots
