"""scripts/score_parity.py — the ready-to-run accuracy-parity harness
(VERDICT r4 next-step #8). Self-test covers schemas/alignment/gate; here we
additionally pin the numpy finalization against the REFERENCE's own torch
metrics (utils/metrics.py topk_accuracies / multitask_topk_accuracies — the
exact arithmetic meters.py:1715-1753 finalizes with)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)
import ref_shim  # noqa: E402  (installs loguru/fvcore shims)

import score_parity as sp  # noqa: E402


def test_self_test():
    sp.self_test()


def test_finalization_matches_reference_metrics():
    import torch

    ref_shim.load_reference_models()  # installs the synthetic parent package
    from audio_slowfast.utils import metrics as ref_metrics

    rng = np.random.default_rng(3)
    for _ in range(4):
        p = rng.standard_normal((50, 12))
        l = rng.integers(0, 12, 50)
        p2 = rng.standard_normal((50, 7))
        l2 = rng.integers(0, 7, 50)
        got = sp.topk_accuracies(p, l)
        want = [
            float(x)
            for x in ref_metrics.topk_accuracies(
                torch.tensor(p), torch.tensor(l), (1, 5)
            )
        ]
        np.testing.assert_allclose(got, want, atol=1e-9)
        got_a = sp.multitask_topk_accuracies((p, p2), (l, l2))
        want_a = [
            float(x)
            for x in ref_metrics.multitask_topk_accuracies(
                (torch.tensor(p), torch.tensor(p2)),
                (torch.tensor(l), torch.tensor(l2)),
                (1, 5),
            )
        ]
        np.testing.assert_allclose(got_a, want_a, atol=1e-9)


def test_repo_pickle_flows_through(tmp_path):
    """A real repo-schema test_scores.pkl (the exact _save_scores payload)
    loads, finalizes, and gates against itself at delta 0."""
    import pickle

    rng = np.random.default_rng(1)
    payload = {
        "verb_output": rng.standard_normal((12, 6)).astype(np.float32),
        "noun_output": rng.standard_normal((12, 8)).astype(np.float32),
        "labels": {
            "verb": rng.integers(0, 6, 12),
            "noun": rng.integers(0, 8, 12),
        },
        "narration_id": [f"n{i}" for i in range(12)],
    }
    p = tmp_path / "test_scores.pkl"
    with open(p, "wb") as f:
        pickle.dump(payload, f)
    rep = sp.compare(str(p), str(p), gate=0.1)
    assert rep["pass"] and rep["worst_delta"] == 0.0
    assert {"verb_top1_acc", "noun_top5_acc", "action_top1_acc"} <= set(
        rep["metrics"]
    )


def test_misaligned_ids_error(tmp_path):
    import pickle

    rng = np.random.default_rng(2)

    def dump(name, ids):
        payload = {
            "verb_output": rng.standard_normal((4, 6)),
            "noun_output": rng.standard_normal((4, 8)),
            "labels": {"verb": np.zeros(4, np.int64), "noun": np.zeros(4, np.int64)},
            "narration_id": ids,
        }
        with open(tmp_path / name, "wb") as f:
            pickle.dump(payload, f)
        return str(tmp_path / name)

    a = dump("a.pkl", ["x1", "x2", "x3", "x4"])
    b = dump("b.pkl", ["x1", "x2", "x3", "x9"])
    with pytest.raises(ValueError, match="narration_id sets differ"):
        sp.compare(a, b, gate=0.1)
