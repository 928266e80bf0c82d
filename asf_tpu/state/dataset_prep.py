"""Offline dataset preparation (fork-specific experiment layer).

Parity with /root/reference/src/dataset.py:23-542:
  * filter EPIC annotations to chosen verbs (or all)
  * parse the PDDL domain -> per-action precs/posts vectors; write
    ``attributes.csv``
  * CLIP text embeddings for all nouns (pickled table)
  * optional class-balancing augmentation: assign per-row waveform
    ``transformation`` names by binomial sampling until each class reaches
    ``factor * max_class_count`` (:397-482)
  * extend rows with ``noun_embedding, precs/posts(+_vec)``; save processed
    train/val pickles

CLIP note: the reference loads OpenAI CLIP ViT-B/32 at prep time
(src/dataset.py:106-113). In an offline TPU environment the embeddings come
from (a) an existing pickled table, (b) a locally cached HF CLIP text model
via transformers, or (c) a deterministic seeded fallback (flagged loudly) so
the rest of the pipeline stays testable.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from asf_tpu.data.transforms import get_transforms
from asf_tpu.utils.logging import get_logger
from .pddl import parse_pddl

logger = get_logger(__name__)

CLIP_DIM = 512


def load_verbs(
    verbs_from_args: List[str], path: str, all_verbs: bool = False
) -> Tuple[List[int], Dict[int, str], pd.DataFrame]:
    verbs_df = pd.read_csv(path)
    if all_verbs:
        chosen = verbs_df
    else:
        chosen = verbs_df[verbs_df["key"].isin(verbs_from_args)]
    ids = chosen["id"].tolist()
    map_ids_verbs = dict(zip(chosen["id"], chosen["key"]))
    return ids, map_ids_verbs, verbs_df


def load_nouns(path: str) -> pd.DataFrame:
    return pd.read_csv(path)


def load_dataset(path: str, small: bool = False) -> pd.DataFrame:
    df = pd.read_pickle(path)
    return df[:100] if small else df


def get_nouns_clip_embeddings(
    nouns: pd.DataFrame, path: str, model_name: str = "ViT-B/32"
) -> Dict[int, Dict[str, np.ndarray]]:
    """noun id -> {"embedding": (1, 512) float32}; persisted to ``path``."""
    if path and os.path.exists(path):
        table = pd.read_pickle(path)
        logger.info("Loaded noun CLIP embeddings from %s", path)
        return {
            idx: {"embedding": np.asarray(row).reshape(1, -1).astype(np.float32)}
            for idx, row in table.iterrows()
        }

    embeddings = _compute_clip_embeddings(nouns, model_name)
    if path:
        pd.DataFrame.from_dict(
            {k: v["embedding"].reshape(-1) for k, v in embeddings.items()},
            orient="index",
        ).to_pickle(path)
    return embeddings


def _compute_clip_embeddings(nouns: pd.DataFrame, model_name: str):
    try:
        import torch
        from transformers import CLIPTextModel, CLIPTokenizer

        hf_name = "openai/clip-vit-base-patch32"
        tok = CLIPTokenizer.from_pretrained(hf_name, local_files_only=True)
        mdl = CLIPTextModel.from_pretrained(hf_name, local_files_only=True)
        out = {}
        with torch.no_grad():
            for _, row in nouns.iterrows():
                text = f"a photo of a {row['key'].replace(':', ' ')}"
                ids = tok(text, return_tensors="pt", padding=True)
                emb = mdl(**ids).pooler_output.numpy().astype(np.float32)
                out[int(row["id"])] = {"embedding": emb.reshape(1, -1)}
        logger.info("Computed CLIP noun embeddings via transformers")
        return out
    except Exception as e:
        logger.warning(
            "CLIP model unavailable (%s); using deterministic seeded pseudo-"
            "embeddings. Provide NOUNS_EMBEDDINGS_FILE for real CLIP vectors.",
            e,
        )
        out = {}
        for _, row in nouns.iterrows():
            rng = np.random.default_rng(abs(hash(str(row["key"]))) % (2**32))
            v = rng.standard_normal((1, CLIP_DIM)).astype(np.float32)
            out[int(row["id"])] = {"embedding": v / np.linalg.norm(v)}
        return out


def augment_data(
    df: pd.DataFrame,
    transforms: Dict[str, Any],
    balance: bool = True,
    factor: float = 1.0,
    seed: Optional[int] = None,
) -> pd.DataFrame:
    """Class-balancing augmentation planner (src/dataset.py:397-482)."""
    rng = np.random.default_rng(seed)
    verb_counts = df["verb_class"].value_counts().to_dict()
    max_value = factor * max(verb_counts.values())
    t_per_sample = {c: (max_value - n) / n for c, n in verb_counts.items()}

    df = df.copy()
    df["transformation"] = "none"
    t_names = list(transforms.keys())

    rows, index = [], []
    for idx, row in df.iterrows():
        rows.append(row)
        index.append(idx)
        if balance:
            t = t_per_sample[row["verb_class"]]
            if 0 < t <= 1:
                if rng.binomial(1, t):
                    aug = row.copy()
                    aug["transformation"] = rng.choice(t_names)
                    rows.append(aug)
                    index.append(idx)
            elif t > 1:
                for _ in range(round(t)):
                    aug = row.copy()
                    aug["transformation"] = rng.choice(t_names)
                    rows.append(aug)
                    index.append(idx)
        else:
            for name in t_names:
                aug = row.copy()
                aug["transformation"] = name
                rows.append(aug)
                index.append(idx)
    return pd.DataFrame(rows, index=index)


def extend_data(
    df: pd.DataFrame,
    map_ids_verbs: Dict[int, str],
    vectors: Optional[Dict[str, Any]] = None,
    clip_embeddings: Optional[Dict[int, Dict[str, np.ndarray]]] = None,
) -> pd.DataFrame:
    """Attach noun_embedding + precs/posts (+vec) columns (src/dataset.py:351-394)."""
    out = df.copy()
    verb_names = out["verb_class"].map(map_ids_verbs)
    if clip_embeddings is not None:
        out.loc[:, "noun_embedding"] = out["noun_class"].map(
            lambda n: clip_embeddings[int(n)]["embedding"]
        )
    if vectors is not None:
        out.loc[:, "precs"] = verb_names.map(lambda v: vectors[v]["precs"] if v in vectors else [])
        out.loc[:, "posts"] = verb_names.map(lambda v: vectors[v]["posts"] if v in vectors else [])
        out.loc[:, "precs_vec"] = verb_names.map(
            lambda v: vectors[v]["precs_vec"] if v in vectors else []
        )
        out.loc[:, "posts_vec"] = verb_names.map(
            lambda v: vectors[v]["posts_vec"] if v in vectors else []
        )
    return out


def prepare_dataset(cfg) -> None:
    """Full offline prep (src/dataset.py:23-156)."""
    if cfg.EPICKITCHENS.SMALL:
        logger.warning("Using small dataset")
        cfg.EPICKITCHENS.AUGMENT.FACTOR = 1.0
        cfg.EPICKITCHENS.AUGMENT.ENABLE = True

    ids, map_ids_verbs, _ = load_verbs(
        verbs_from_args=cfg.EPICKITCHENS.VERBS,
        path=cfg.EPICKITCHENS.VERBS_FILE,
        all_verbs=cfg.EPICKITCHENS.ALL_VERBS,
    )

    train_df = load_dataset(cfg.EPICKITCHENS.ORIGINAL_TRAIN_LIST, cfg.EPICKITCHENS.SMALL)
    val_df = load_dataset(cfg.EPICKITCHENS.ORIGINAL_VAL_LIST, cfg.EPICKITCHENS.SMALL)

    filtered_train_df = train_df[train_df.verb_class.isin(ids)]
    filtered_val_df = val_df[val_df.verb_class.isin(ids)]

    nouns = load_nouns(cfg.EPICKITCHENS.NOUNS_FILE)

    actions, attributes = parse_pddl(
        cfg.EPICKITCHENS.STATE.PDDL_DOMAIN, cfg.EPICKITCHENS.STATE.PDDL_PROBLEM
    )
    if not cfg.MODEL.ONLY_ACTION_RECOGNITION:
        missing = set(map_ids_verbs.values()) - {a.name for a in actions}
        assert not missing, f"Some actions are not in the list of verbs: {missing}"

    pd.DataFrame(attributes, columns=["attribute"]).to_csv(
        cfg.MODEL.PDDL_ATTRIBUTES, index=False
    )

    clip_embeddings = get_nouns_clip_embeddings(
        nouns, cfg.EPICKITCHENS.STATE.NOUNS_EMBEDDINGS_FILE, cfg.MODEL.CLIP_MODEL
    )

    vectors = {
        a.name: {
            "precs": [str(p) for p in a.preconditions],
            "posts": [str(p) for p in a.postconditions],
            "precs_vec": a.vectorize(attributes)[0],
            "posts_vec": a.vectorize(attributes)[1],
        }
        for a in actions
    }

    if cfg.EPICKITCHENS.AUGMENT.ENABLE:
        filtered_train_df = augment_data(
            filtered_train_df,
            get_transforms(),
            balance=cfg.EPICKITCHENS.AUGMENT.BALANCE,
            factor=cfg.EPICKITCHENS.AUGMENT.FACTOR,
            seed=cfg.RNG_SEED,
        )

    filtered_train_df = extend_data(filtered_train_df, map_ids_verbs, vectors, clip_embeddings)
    filtered_val_df = extend_data(filtered_val_df, map_ids_verbs, vectors, clip_embeddings)

    filtered_train_df.to_pickle(cfg.EPICKITCHENS.PROCESSED_TRAIN_LIST)
    filtered_val_df.to_pickle(cfg.EPICKITCHENS.PROCESSED_VAL_LIST)
    logger.info(
        "Dataset prepared: %s / %s",
        cfg.EPICKITCHENS.PROCESSED_TRAIN_LIST,
        cfg.EPICKITCHENS.PROCESSED_VAL_LIST,
    )
