"""Author the experiment YAML set under models/asf/config/.

The reference ships 16 experiment YAMLs plus 7 sliding-window variants
(/root/reference/models/asf/config/*.yaml) that differ from a common base by
small deltas (dataset class, batch size, checkpoint init, augmentation,
state head, slide windows). This script generates our equivalents — same
filenames, same cfg keys and hyperparameters (they are the published
experiment definitions), emitted from a base + per-experiment override
table so the set stays consistent.

Run:  python scripts/gen_configs.py
"""

from __future__ import annotations

import copy
import os

import yaml

OUT = os.path.join(os.path.dirname(__file__), "..", "models", "asf", "config")

STATE_VERBS = [
    "add", "apply", "attach", "break", "close", "cut", "dry", "empty",
    "fill", "flip", "fold", "hold", "insert", "mix", "move", "open", "pat",
    "peel", "pour", "press", "put", "remove", "rip", "scoop", "scrape",
    "shake", "squeeze", "stretch", "take", "throw", "turn-off", "turn-on",
    "wash",
]

ANNOT = "data/epic-kitchens-100-annotations"

BASE = {
    "TRAIN": {
        "ENABLE": True,
        "DATASET": "EpicKitchensGRU",
        "BATCH_SIZE": 16,
        "EVAL_PERIOD": 2,
        "CHECKPOINT_PERIOD": 2,
        "CHECKPOINT_FILE_PATH": "models/asf/weights/SLOWFAST_EPIC.pyth",
        "CHECKPOINT_EPOCH_RESET": True,
        "AUTO_RESUME": True,
    },
    "DATA": {"INPUT_CHANNEL_NUM": [1, 1], "ONLY_SYMBOLIC_STATE": False},
    "AUDIO_DATA": {
        "CLIP_SECS": 1.999,
        "NUM_FRAMES": 400,
        "SPECTROGRAM_OVERLAP": 1.0,
        "MAX_NB_SPECTROGRAMS": 20,
    },
    "SLOWFAST": {
        "ALPHA": 4,
        "BETA_INV": 8,
        "FUSION_CONV_CHANNEL_RATIO": 2,
        "FUSION_KERNEL_SZ": 7,
    },
    "RESNET": {
        "ZERO_INIT_FINAL_BN": True,
        "WIDTH_PER_GROUP": 64,
        "NUM_GROUPS": 1,
        "DEPTH": 50,
        "TRANS_FUNC": "bottleneck_transform",
        "STRIDE_1X1": False,
        "NUM_BLOCK_TEMP_KERNEL": [[3, 3], [4, 4], [6, 6], [3, 3]],
        "FREQUENCY_STRIDES": [[1, 1], [2, 2], [2, 2], [2, 2]],
        "FREQUENCY_DILATIONS": [[1, 1], [1, 1], [1, 1], [1, 1]],
    },
    "BN": {"USE_PRECISE_STATS": True, "FREEZE": True, "NUM_BATCHES_PRECISE": 64},
    "SOLVER": {
        "BASE_LR": 0.01,
        "LR_POLICY": "steps_with_relative_lrs",
        "STEPS": [0, 20, 25],
        "LRS": [1, 0.1, 0.01],
        "MAX_EPOCH": 30,
        "MOMENTUM": 0.9,
        "WEIGHT_DECAY": 1e-4,
        "WARMUP_EPOCHS": -1.0,
        "WARMUP_START_LR": 0.01,
        "OPTIMIZING_METHOD": "sgd",
    },
    "MODEL": {
        "MODEL_NAME": "AudioSlowFastGRU",
        "NUM_CLASSES": [97, 300],
        "VOCAB_FILE": "models/asf/config/vocab.txt",
        "PDDL_ATTRIBUTES": "models/asf/config/attributes.csv",
        "ARCH": "slowfast",
        "LOSS_FUNC": "cross_entropy",
        "STATE_LOSS_FUNC": "masked_loss",
        "DROPOUT_RATE": 0.5,
        "ONLY_ACTION_RECOGNITION": True,
        "CLIP_MODEL": "ViT-B/32",
    },
    "TEST": {"ENABLE": False, "DATASET": "EpicKitchensGRU", "BATCH_SIZE": 16},
    "DATA_LOADER": {"NUM_WORKERS": 8, "PIN_MEMORY": True},
    "EPICKITCHENS": {
        "SKIP_PREPARATION": False,
        "SMALL": False,
        "SINGLE_BATCH": False,
        "MAKE_PLOTS": False,
        "VERBS": [],
        "ALL_VERBS": True,
        "AUDIO_DATA_FILE": "data/EPIC_audio.hdf5",
        "ORIGINAL_TRAIN_LIST": f"{ANNOT}/EPIC_100_train.pkl",
        "ORIGINAL_VAL_LIST": f"{ANNOT}/EPIC_100_validation.pkl",
        "ORIGINAL_TEST_LIST": f"{ANNOT}/EPIC_100_validation.pkl",
        "PROCESSED_TRAIN_LIST": f"{ANNOT}/full_train.pkl",
        "PROCESSED_VAL_LIST": f"{ANNOT}/full_val.pkl",
        "PROCESSED_TEST_LIST": f"{ANNOT}/full_val.pkl",
        "VERBS_FILE": f"{ANNOT}/EPIC_100_verb_classes.csv",
        "NOUNS_FILE": f"{ANNOT}/EPIC_100_noun_classes.csv",
        "STATE": {
            "PDDL_DOMAIN": "pddl/domain.pddl",
            "PDDL_PROBLEM": "pddl/problem.pddl",
            "NOUNS_EMBEDDINGS_FILE": f"{ANNOT}/nouns_embeddings.pkl",
        },
        "AUGMENT": {"ENABLE": False, "FACTOR": 4.0},
    },
    "TENSORBOARD": {"ENABLE": True, "LOG_DIR": "tensorboard"},
    "NUM_GPUS": 1,
    "NUM_SHARDS": 1,
    "RNG_SEED": 25,
    "OUTPUT_DIR": "runs/asf-gru",
    "WANDB": {"ENABLE": True},
}


def deep_merge(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            deep_merge(dst[k], v)
        else:
            dst[k] = v
    return dst


def variant(*overrides) -> dict:
    out = copy.deepcopy(BASE)
    for over in overrides:
        deep_merge(out, copy.deepcopy(over))
    return out


def flat(run: str, dataset: str = "EpicKitchens", *overrides) -> dict:
    """Non-GRU single-clip experiment: plain AudioSlowFast, big batches."""
    base = {
        "TRAIN": {
            "DATASET": dataset,
            "BATCH_SIZE": 128,
            "EVAL_PERIOD": 1,
            "CHECKPOINT_PERIOD": 1,
        },
        "TEST": {"DATASET": dataset, "BATCH_SIZE": 128},
        "SOLVER": {"BASE_LR": 0.001},
        "MODEL": {"MODEL_NAME": "AudioSlowFast"},
        "OUTPUT_DIR": f"runs/{run}",
        "RNG_SEED": 0,
    }
    return variant(base, *overrides)


def state_filtering() -> dict:
    """The 33-verb PDDL filter used by every state experiment."""
    return {
        "EPICKITCHENS": {
            "VERBS": STATE_VERBS,
            "ALL_VERBS": False,
            "STATE": {"PDDL_DOMAIN": "pddl/full_domain.pddl"},
        },
        "MODEL": {"ONLY_ACTION_RECOGNITION": False},
    }


def lists(run: str, stem: str) -> dict:
    return {
        "EPICKITCHENS": {
            "PROCESSED_TRAIN_LIST": f"runs/{run}/full_train_{stem}.pkl",
            "PROCESSED_VAL_LIST": f"runs/{run}/full_val_{stem}.pkl",
            "PROCESSED_TEST_LIST": f"runs/{run}/full_val_{stem}.pkl",
        }
    }


def gru(run: str, *overrides) -> dict:
    base = deep_merge(
        {
            "TRAIN": {"EVAL_PERIOD": 1, "CHECKPOINT_PERIOD": 1},
            "SOLVER": {"STEPS": [0, 15, 17], "MAX_EPOCH": 20},
            "EPICKITCHENS": {"AUGMENT": {"FACTOR": 1.0001}},
            "OUTPUT_DIR": f"runs/{run}",
        },
        lists(run, "no_augment"),
    )
    return variant(base, *overrides)


VGG_INIT = {"TRAIN": {"CHECKPOINT_FILE_PATH": "models/asf/weights/SLOWFAST_VGG.pyth"}}
AUGMENT_ON = {
    "EPICKITCHENS": {"AUGMENT": {"ENABLE": True, "BALANCE": False, "FACTOR": 1.0001}}
}


def slide(run: str, win: float | None, **slide_over) -> dict:
    s = {
        "ENABLE": True,
        "WIN_SIZE": win if win is not None else 2.0,
        "HOP_SIZE": 0.5,
        "LABEL_FRAME": 0.5,
        "INSIDE_ACTION_BOUNDS": False,
        "PER_ACTION_INSTANCE": False,
    }
    s.update(slide_over)
    return flat(
        run,
        "EpicKitchensSlide",
        {
            "TEST": {"ENABLE": True, "NUM_ENSEMBLE_VIEWS": 1, "SLIDE": s},
            "BN": {"NUM_BATCHES_PRECISE": 200},
        },
    )


GRU_PDDL_DATASET = {
    "TRAIN": {"DATASET": "EpicKitchensGRUwithPDDL"},
    "TEST": {"DATASET": "EpicKitchensGRUwithPDDL"},
}

CONFIGS = {
    # Base GRU fine-tuning experiment (reference SLOWFAST_R50.yaml)
    "SLOWFAST_R50.yaml": variant(),
    # Local/debug variant: small batch, no checkpoint init, CPU-sized loader
    "SLOWFAST_R50.local.yaml": variant(
        {
            "TRAIN": {"BATCH_SIZE": 4, "CHECKPOINT_FILE_PATH": "", "CHECKPOINT_PERIOD": 1},
            "TEST": {"BATCH_SIZE": 4},
            "DATA_LOADER": {"NUM_WORKERS": 1, "PIN_MEMORY": False},
            "EPICKITCHENS": {"SMALL": True},
            "WANDB": {"ENABLE": False},
            "RNG_SEED": 0,
            "OUTPUT_DIR": "runs/asf-local",
        }
    ),
    # --- plain (non-GRU) experiments ---
    "asf-augment.yaml": flat(
        "asf-augment-unbalanced", "EpicKitchens",
        AUGMENT_ON, lists("asf-augment-unbalanced", "augment_1"),
    ),
    "asf-augment-vgg.yaml": flat(
        "asf-augment-vgg", "EpicKitchens",
        VGG_INIT, AUGMENT_ON, lists("asf-augment-vgg", "augment_1"),
    ),
    "asf-original-augment.yaml": flat(
        "asf-original-vgg-augment", "EpicKitchens",
        VGG_INIT, AUGMENT_ON,
        {
            "TRAIN": {"BATCH_SIZE": 32},
            "TEST": {"BATCH_SIZE": 32},
            "BN": {"NUM_BATCHES_PRECISE": 200},
            "EPICKITCHENS": {
                "PROCESSED_TRAIN_LIST": "runs/asf-original-vgg-augment/EPIC_100_train.pkl",
                "PROCESSED_VAL_LIST": "runs/asf-original-vgg-augment/EPIC_100_validation.pkl",
                "PROCESSED_TEST_LIST": "runs/asf-original-vgg-augment/EPIC_100_validation.pkl",
                "STATE": {"PDDL_DOMAIN": "pddl/full_domain.pddl"},
            },
        },
    ),
    "asf-augment-state.yaml": flat(
        "asf-augment-state", "EpicKitchensWithPDDL",
        AUGMENT_ON, state_filtering(), lists("asf-augment-state", "augment_1"),
        {"DATA_LOADER": {"NUM_WORKERS": 4, "PIN_MEMORY": False}},
    ),
    "asf-state.yaml": flat(
        "asf-state", "EpicKitchensWithPDDL",
        state_filtering(), lists("asf-state", "augment_1"),
        {
            "DATA_LOADER": {"NUM_WORKERS": 4, "PIN_MEMORY": False},
            "EPICKITCHENS": {"SINGLE_BATCH": True},
            "WANDB": {"ENABLE": False},
        },
    ),
    # --- GRU experiments ---
    "asf-gru.yaml": gru("asf-gru"),
    "asf-gru-vgg.yaml": gru("asf-gru-vgg", VGG_INIT),
    "asf-gru-augment.yaml": gru("asf-gru-augment", AUGMENT_ON),
    "asf-gru-augment-vgg.yaml": gru("asf-gru-augment-vgg", VGG_INIT, AUGMENT_ON),
    "asf-gru-state.yaml": gru(
        "asf-gru-state", GRU_PDDL_DATASET, state_filtering(),
    ),
    "asf-gru-state-vgg.yaml": gru(
        "asf-gru-state-vgg", GRU_PDDL_DATASET, VGG_INIT, state_filtering(),
    ),
    "asf-gru-state-tests.yaml": gru(
        "asf-gru-state-tests", GRU_PDDL_DATASET, state_filtering(),
        {
            "TRAIN": {"BATCH_SIZE": 5, "EVAL_PERIOD": 200, "CHECKPOINT_PERIOD": 200},
            "TEST": {"BATCH_SIZE": 5},
            "EPICKITCHENS": {"SKIP_PREPARATION": True, "SINGLE_BATCH": True},
            "WANDB": {"ENABLE": False},
        },
    ),
    "asf-gru-augment-state.yaml": gru(
        "asf-gru-augment-state", GRU_PDDL_DATASET, AUGMENT_ON, state_filtering(),
    ),
    "asf-gru-augment-state-vgg.yaml": gru(
        "asf-gru-augment-state-vgg", GRU_PDDL_DATASET, VGG_INIT, AUGMENT_ON,
        state_filtering(),
    ),
}

# --- sliding-window test variants ---
for w in ["0,5", "1", "2", "4", "8"]:
    win = float(w.replace(",", "."))
    CONFIGS[f"slide/asf-original-whole-video-{w}s.yaml"] = slide(
        f"asf-slide-whole-{w}s", win
    )
CONFIGS["slide/asf-original-action-bounds.yaml"] = slide(
    "asf-slide-action-bounds", 2.0, INSIDE_ACTION_BOUNDS=True
)
CONFIGS["slide/asf-original-per-instance.yaml"] = slide(
    "asf-slide-per-instance", 2.0, INSIDE_ACTION_BOUNDS=True, PER_ACTION_INSTANCE=True
)


def main():
    for name, cfg in CONFIGS.items():
        path = os.path.join(OUT, name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False, default_flow_style=None)
        print("wrote", os.path.relpath(path))


if __name__ == "__main__":
    main()
