from .builders import (
    MODEL_REGISTRY,
    AudioSlowFast,
    AudioSlowFastGRU,
    ResNet,
    build_model,
)
from .losses import get_loss_func

__all__ = [
    "MODEL_REGISTRY",
    "AudioSlowFast",
    "AudioSlowFastGRU",
    "ResNet",
    "build_model",
    "get_loss_func",
]
