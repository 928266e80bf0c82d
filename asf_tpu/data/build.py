"""Dataset registry.

Parity with /root/reference/audio_slowfast/datasets/build.py:9-41 (fvcore
Registry replaced by a plain dict — same lookup semantics).
"""

DATASET_REGISTRY = {}


def register_dataset(name):
    def deco(cls):
        DATASET_REGISTRY[name] = cls
        return cls

    return deco


def build_dataset(dataset_name, cfg, split):
    # Case-insensitive lookup: the reference capitalizes via registry names
    # like "Vggsound"/"EpicKitchens"; configs use e.g. TRAIN.DATASET both ways.
    for key, cls in DATASET_REGISTRY.items():
        if key.lower() == dataset_name.lower():
            return cls(cfg, split)
    raise KeyError(
        f"Dataset '{dataset_name}' not registered; have {sorted(DATASET_REGISTRY)}"
    )
