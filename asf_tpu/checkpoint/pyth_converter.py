"""Torch ``.pyth`` checkpoint <-> Flax variables converter.

The reference saves ``{epoch, model_state, optimizer_state, cfg}`` via
torch.save (/root/reference/audio_slowfast/utils/checkpoint.py:96-125), with
SubBN stats already normalised to plain BN keys (``sub_to_normal_bn``,
checkpoint.py:206-244). This module converts that ``model_state`` into the
Flax variable tree of asf_tpu models (and back), handling:

  * conv kernels: torch OIHW -> flax HWIO
  * linear weights: torch (O, I) -> flax (I, O)
  * BN: weight/bias -> scale/bias params; running_mean/var -> batch_stats
  * GRU: torch flat parameter names kept verbatim (asf_tpu stores GRU weights
    in the torch layout; see asf_tpu/models/gru.py)
  * name-pattern clearing and shape-matched partial load
    (parity with checkpoint.py:128-203 ``strict=False`` behaviour)
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


_GRU_PARAM = re.compile(r"^(weight|bias)_(ih|hh)_l\d+(_reverse)?$")


def torch_state_to_flax(
    state_dict: Dict[str, Any],
    clear_name_patterns=(),
) -> Dict[str, Dict]:
    """Convert a torch model_state dict to {'params': ..., 'batch_stats': ...}.

    Tensors may be torch tensors or numpy arrays.
    """
    params: Dict = {}
    batch_stats: Dict = {}
    skipped = []

    for key, tensor in state_dict.items():
        for pattern in clear_name_patterns:
            key = key.replace(pattern, "")
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        tokens = key.split(".")
        leaf = tokens[-1]
        prefix = tokens[:-1]

        if leaf == "num_batches_tracked":
            continue
        if _GRU_PARAM.match(leaf):
            # GRU flat parameter, torch layout preserved.
            _set(params, tuple(prefix) + (leaf,), arr.astype(np.float32))
            continue
        if leaf == "running_mean":
            _set(batch_stats, tuple(prefix) + ("mean",), arr.astype(np.float32))
            continue
        if leaf == "running_var":
            _set(batch_stats, tuple(prefix) + ("var",), arr.astype(np.float32))
            continue
        if leaf == "weight":
            if arr.ndim == 4:  # conv OIHW -> HWIO
                _set(params, tuple(prefix) + ("kernel",), np.transpose(arr, (2, 3, 1, 0)).astype(np.float32))
            elif arr.ndim == 2:  # linear (O, I) -> (I, O)
                _set(params, tuple(prefix) + ("kernel",), np.transpose(arr, (1, 0)).astype(np.float32))
            elif arr.ndim == 1:  # BN gamma
                _set(params, tuple(prefix) + ("scale",), arr.astype(np.float32))
            else:
                skipped.append(key)
            continue
        if leaf == "bias":
            _set(params, tuple(prefix) + ("bias",), arr.astype(np.float32))
            continue
        skipped.append(key)

    out = {"params": params, "batch_stats": batch_stats}
    if skipped:
        out["_skipped_keys"] = skipped
    return out


def flax_to_torch_state(variables: Dict[str, Dict]) -> Dict[str, np.ndarray]:
    """Inverse conversion: Flax variables -> flat torch-style state dict."""
    state: Dict[str, np.ndarray] = {}

    def walk_params(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk_params(v, path + [k])
            else:
                arr = np.asarray(v)
                name = ".".join(path)
                if k == "kernel":
                    if arr.ndim == 4:
                        state[name + ".weight"] = np.transpose(arr, (3, 2, 0, 1))
                    else:
                        state[name + ".weight"] = np.transpose(arr, (1, 0))
                elif k == "scale":
                    state[name + ".weight"] = arr
                elif k == "bias":
                    state[name + ".bias"] = arr
                elif _GRU_PARAM.match(k):
                    state[".".join(path + [k])] = arr
                else:
                    state[".".join(path + [k])] = arr

    def walk_stats(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk_stats(v, path + [k])
            else:
                name = ".".join(path)
                if k == "mean":
                    state[name + ".running_mean"] = np.asarray(v)
                elif k == "var":
                    state[name + ".running_var"] = np.asarray(v)

    walk_params(variables.get("params", {}), [])
    walk_stats(variables.get("batch_stats", {}), [])
    return state


def load_pyth(path: str) -> Dict[str, Any]:
    """Load a reference .pyth checkpoint (torch.save dict)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt


def merge_partial(
    target: Dict, source: Dict, path="",
) -> Tuple[Dict, list]:
    """Shape-matched partial load: copy source leaves into target where the
    key exists and the shape matches; report mismatches.

    Parity with the reference's ``strict=False`` + shape filtering
    (utils/checkpoint.py:128-203).
    """
    mismatched = []

    def rec(dst, src, p):
        out = {}
        for k, v in dst.items():
            sp = f"{p}.{k}" if p else k
            if k in src:
                if isinstance(v, dict) and isinstance(src[k], dict):
                    out[k] = rec(v, src[k], sp)
                elif not isinstance(v, dict) and not isinstance(src[k], dict):
                    if tuple(np.shape(v)) == tuple(np.shape(src[k])):
                        out[k] = np.asarray(src[k], dtype=np.asarray(v).dtype)
                    else:
                        mismatched.append((sp, tuple(np.shape(src[k])), tuple(np.shape(v))))
                        out[k] = v
                else:
                    mismatched.append((sp, "tree-mismatch", None))
                    out[k] = v
            else:
                mismatched.append((sp, "missing", None))
                out[k] = v
        return out

    merged = rec(target, source, path)
    return merged, mismatched
