"""End-to-end test of the offline dataset preparation layer
(asf_tpu/state/dataset_prep.py; parity with /root/reference/src/dataset.py:23-156):
verb filtering, PDDL vectorisation + attributes.csv, noun embeddings
(deterministic fallback), class-balancing augmentation, extended pickles."""

import os

import numpy as np
import pandas as pd
import pytest

from asf_tpu.config import get_cfg
from asf_tpu.state.dataset_prep import augment_data, prepare_dataset
from asf_tpu.data.transforms import get_transforms

DOMAIN_VERBS = ["break", "close", "cut", "dry", "fill", "open", "shake", "wash"]


def _prep_cfg(root):
    os.makedirs(root, exist_ok=True)
    verbs = pd.DataFrame({"id": range(10), "key": DOMAIN_VERBS + ["peel", "pour"]})
    verbs.to_csv(os.path.join(root, "verbs.csv"), index=False)
    nouns = pd.DataFrame({"id": range(5), "key": ["pan", "cup", "tap", "lid", "egg"]})
    nouns.to_csv(os.path.join(root, "nouns.csv"), index=False)

    rng = np.random.default_rng(0)
    rows = {
        "verb_class": rng.integers(0, 8, 40),
        "noun_class": rng.integers(0, 5, 40),
        "video_id": ["P01_01"] * 40,
    }
    # skew classes so the balancing has something to do
    rows["verb_class"][:20] = 0
    pd.DataFrame(rows).to_pickle(os.path.join(root, "orig_train.pkl"))
    pd.DataFrame({k: v[:10] for k, v in rows.items()}).to_pickle(
        os.path.join(root, "orig_val.pkl")
    )

    cfg = get_cfg()
    ek = cfg.EPICKITCHENS
    ek.VERBS_FILE = os.path.join(root, "verbs.csv")
    ek.NOUNS_FILE = os.path.join(root, "nouns.csv")
    ek.ORIGINAL_TRAIN_LIST = os.path.join(root, "orig_train.pkl")
    ek.ORIGINAL_VAL_LIST = os.path.join(root, "orig_val.pkl")
    ek.PROCESSED_TRAIN_LIST = os.path.join(root, "full_train.pkl")
    ek.PROCESSED_VAL_LIST = os.path.join(root, "full_val.pkl")
    ek.STATE.PDDL_DOMAIN = "pddl/domain.pddl"
    ek.STATE.PDDL_PROBLEM = "pddl/problem.pddl"
    ek.STATE.NOUNS_EMBEDDINGS_FILE = os.path.join(root, "nouns_embeddings.pkl")
    ek.VERBS = DOMAIN_VERBS
    ek.ALL_VERBS = False
    ek.AUGMENT.ENABLE = True
    ek.AUGMENT.BALANCE = True
    ek.AUGMENT.FACTOR = 1.0
    cfg.MODEL.PDDL_ATTRIBUTES = os.path.join(root, "attributes.csv")
    cfg.MODEL.ONLY_ACTION_RECOGNITION = False
    return cfg


def test_prepare_dataset_end_to_end(tmp_path):
    cfg = _prep_cfg(str(tmp_path))
    prepare_dataset(cfg)

    attrs = pd.read_csv(cfg.MODEL.PDDL_ATTRIBUTES)["attribute"].tolist()
    assert len(attrs) == 13 and attrs == sorted(attrs)  # domain.pddl predicates

    train = pd.read_pickle(cfg.EPICKITCHENS.PROCESSED_TRAIN_LIST)
    val = pd.read_pickle(cfg.EPICKITCHENS.PROCESSED_VAL_LIST)
    for df in (train, val):
        for col in ("noun_embedding", "precs_vec", "posts_vec", "precs", "posts"):
            assert col in df.columns, df.columns
        emb = np.asarray(df.iloc[0]["noun_embedding"])
        assert emb.shape == (1, 512)
        assert len(df.iloc[0]["precs_vec"]) == 13

    # augmentation balanced the skewed class by adding transformed copies
    assert "transformation" in train.columns
    assert (train["transformation"] != "none").any()
    counts = train["verb_class"].value_counts()
    assert counts.max() / counts.min() < 20  # was 20:1-ish before balancing

    # embeddings table persisted and reused on the second run
    assert os.path.exists(cfg.EPICKITCHENS.STATE.NOUNS_EMBEDDINGS_FILE)
    prepare_dataset(cfg)  # idempotent re-run with the cached table


def test_prepare_dataset_rejects_verbs_missing_from_domain(tmp_path):
    cfg = _prep_cfg(str(tmp_path))
    cfg.EPICKITCHENS.VERBS = DOMAIN_VERBS + ["peel"]  # not in domain.pddl
    with pytest.raises(AssertionError, match="peel"):
        prepare_dataset(cfg)


def test_augment_unbalanced_adds_every_transform(tmp_path):
    df = pd.DataFrame({"verb_class": [0, 1], "noun_class": [0, 1]})
    out = augment_data(df, get_transforms(), balance=False, factor=1.0, seed=0)
    n_t = len(get_transforms())
    assert len(out) == 2 * (1 + n_t)
    assert (out["transformation"] == "none").sum() == 2
