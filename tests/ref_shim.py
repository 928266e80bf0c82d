"""Import the reference torch models directly from /root/reference.

The reference model modules (/root/reference/audio_slowfast/models/*.py) only
need two third-party packages that are not installed in this image:

  * ``loguru``  — logging sugar; replaced by a no-op logger object.
  * ``fvcore``  — ``common.registry.Registry`` and
    ``nn.weight_init.c2_msra_fill`` (kaiming-normal fan_out + zero bias),
    both re-implemented here in a few lines.

The top-level ``audio_slowfast/__init__.py`` pulls in the full training
stack (tools/train_net.py and friends), which we do not want; inserting a
synthetic parent package with ``__path__`` pointed at the reference tree
lets ``audio_slowfast.models`` import without executing that ``__init__``.

This module exists so tests can run the REFERENCE implementation as a
numerical oracle (VERDICT round-1, missing #1/#2). Nothing here is shipped.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_loguru() -> None:
    if "loguru" in sys.modules:
        return
    mod = types.ModuleType("loguru")

    class _NoOpLogger:
        def __getattr__(self, name):
            return lambda *a, **k: None

    mod.logger = _NoOpLogger()
    sys.modules["loguru"] = mod


def _install_fvcore() -> None:
    if "fvcore.common.registry" in sys.modules:
        return
    import torch.nn as tnn

    class Registry:
        """Name -> class map with the decorator API fvcore exposes."""

        def __init__(self, name: str):
            self._name = name
            self._obj_map = {}

        def register(self, obj=None):
            if obj is None:
                def deco(cls):
                    self._obj_map[cls.__name__] = cls
                    return cls

                return deco
            self._obj_map[obj.__name__] = obj
            return obj

        def get(self, name: str):
            if name not in self._obj_map:
                raise KeyError(f"{name} not registered in {self._name}")
            return self._obj_map[name]

    def c2_msra_fill(module) -> None:
        tnn.init.kaiming_normal_(module.weight, mode="fan_out", nonlinearity="relu")
        if getattr(module, "bias", None) is not None:
            tnn.init.constant_(module.bias, 0.0)

    fvcore = types.ModuleType("fvcore")
    fvcore.__path__ = []
    common = types.ModuleType("fvcore.common")
    common.__path__ = []
    registry_mod = types.ModuleType("fvcore.common.registry")
    registry_mod.Registry = Registry
    nn_mod = types.ModuleType("fvcore.nn")
    nn_mod.__path__ = []
    weight_init_mod = types.ModuleType("fvcore.nn.weight_init")
    weight_init_mod.c2_msra_fill = c2_msra_fill

    sys.modules["fvcore"] = fvcore
    sys.modules["fvcore.common"] = common
    sys.modules["fvcore.common.registry"] = registry_mod
    sys.modules["fvcore.nn"] = nn_mod
    sys.modules["fvcore.nn.weight_init"] = weight_init_mod
    fvcore.common = common
    fvcore.nn = nn_mod
    common.registry = registry_mod
    nn_mod.weight_init = weight_init_mod


def load_reference_models():
    """Return the reference ``audio_slowfast.models`` module (torch oracle)."""
    if "audio_slowfast.models" in sys.modules:
        return sys.modules["audio_slowfast.models"]
    _install_loguru()
    _install_fvcore()
    pkg = types.ModuleType("audio_slowfast")
    pkg.__path__ = [f"{REFERENCE_ROOT}/audio_slowfast"]
    sys.modules["audio_slowfast"] = pkg
    import audio_slowfast.models as ref_models  # noqa: E402

    return ref_models
