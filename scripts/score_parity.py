"""Accuracy-parity harness: diff two test-score pickles with a 0.1% gate.

The BASELINE north star is real-data accuracy parity (top-1 within 0.1%)
between this framework and the reference on the released checkpoints. No
EPIC/VGG data exists on this rig, so the harness is packaged ready-to-run
(VERDICT r4 next-step #8): the minute data lands, run ``test(cfg)`` on both
sides and point this script at the two score files (or directories).

It understands BOTH pickle schemas:

  * repo (`asf_tpu/engine/test_loop.py:_save_scores`):
      {verb_output, noun_output, labels: {verb, noun}, narration_id}
      or single-task {output, labels}
  * reference (`/root/reference/audio_slowfast/tools/test_net.py:500-541`):
      {verb_output, verb_labels, noun_output, noun_labels, narration_id,
       [state_output, state_labels]}  or  {scores, labels}

and finalizes each side with the reference meters' own arithmetic
(topk_accuracies / multitask_topk_accuracies,
/root/reference/audio_slowfast/utils/meters.py:1715-1753 and
utils/metrics.py), re-expressed in numpy so the harness is
framework-independent.

Usage:
    python scripts/score_parity.py repo_scores.pkl ref_scores.pkl
    python scripts/score_parity.py out/scores/ ref_out/scores/   # dirs: all
        same-named pkl pairs are compared
    python scripts/score_parity.py --self-test

Exit 0 when every top-1/top-5 delta is within the gate (default 0.1
percentage points), 1 otherwise, 2 on schema/alignment errors.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np


# -- canonical loading --------------------------------------------------------
def _np(x) -> np.ndarray:
    """torch tensors (reference pickles) and jax/numpy arrays all to numpy."""
    if hasattr(x, "detach"):  # torch.Tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def load_scores(path: str) -> dict:
    """-> {"heads": {name: (preds (N, C) f64, labels (N,) i64)}, "ids": list|None}"""
    with open(path, "rb") as f:
        d = pickle.load(f)
    heads, ids = {}, None
    if "verb_output" in d:
        labels = d.get("labels")
        for name in ("verb", "noun", "state"):
            out_k, lab_k = f"{name}_output", f"{name}_labels"
            if out_k not in d:
                continue
            lab = d[lab_k] if lab_k in d else labels[name]
            heads[name] = (_np(d[out_k]).astype(np.float64), _np(lab).astype(np.int64))
        ids = d.get("narration_id")
    elif "output" in d:  # repo single-task
        heads["class"] = (_np(d["output"]).astype(np.float64), _np(d["labels"]).astype(np.int64))
    elif "scores" in d:  # reference single-task
        heads["class"] = (_np(d["scores"]).astype(np.float64), _np(d["labels"]).astype(np.int64))
    else:
        raise ValueError(f"{path}: unrecognised score schema (keys: {sorted(d)})")
    if ids is not None:
        ids = [str(i) for i in np.asarray(ids).reshape(-1).tolist()]
    return {"heads": heads, "ids": ids}


def align(a: dict, b: dict) -> tuple[dict, dict]:
    """Sort both sides by narration_id when available (the two frameworks
    iterate datasets in different orders); otherwise require equal lengths."""
    if a["ids"] and b["ids"]:
        if sorted(a["ids"]) != sorted(b["ids"]):
            only_a = set(a["ids"]) - set(b["ids"])
            only_b = set(b["ids"]) - set(a["ids"])
            raise ValueError(
                f"narration_id sets differ (only-left {len(only_a)}, "
                f"only-right {len(only_b)}; e.g. {list(only_a)[:3]} / "
                f"{list(only_b)[:3]})"
            )
        for side in (a, b):
            order = np.argsort(np.asarray(side["ids"]))
            side["heads"] = {
                k: (p[order], l[order]) for k, (p, l) in side["heads"].items()
            }
            side["ids"] = [side["ids"][i] for i in order]
    return a, b


# -- reference finalization (meters.py:1715-1753 arithmetic) ------------------
def topk_accuracies(preds: np.ndarray, labels: np.ndarray, ks=(1, 5)) -> list:
    """utils/metrics.py topk_accuracies: % of rows whose label is in the
    top-k scores. np.argsort is ascending -> take the last k columns."""
    n, c = preds.shape
    out = []
    top = np.argsort(preds, axis=1)
    for k in ks:
        kk = min(k, c)
        hit = (top[:, -kk:] == labels[:, None]).any(axis=1)
        out.append(100.0 * hit.mean())
    return out


def multitask_topk_accuracies(preds_pair, labels_pair, ks=(1, 5)) -> list:
    """utils/metrics.py multitask_topk_accuracies: BOTH heads correct within
    top-k simultaneously (the 'action' metric)."""
    out = []
    for k in ks:
        joint = np.ones(len(labels_pair[0]), bool)
        for preds, labels in zip(preds_pair, labels_pair):
            kk = min(k, preds.shape[1])
            top = np.argsort(preds, axis=1)[:, -kk:]
            joint &= (top == labels[:, None]).any(axis=1)
        out.append(100.0 * joint.mean())
    return out


def finalize(side: dict) -> dict:
    stats = {}
    for name, (p, l) in side["heads"].items():
        t1, t5 = topk_accuracies(p, l)
        stats[f"{name}_top1_acc"] = t1
        stats[f"{name}_top5_acc"] = t5
    if "verb" in side["heads"] and "noun" in side["heads"]:
        (vp, vl), (np_, nl) = side["heads"]["verb"], side["heads"]["noun"]
        a1, a5 = multitask_topk_accuracies((vp, np_), (vl, nl))
        stats["action_top1_acc"] = a1
        stats["action_top5_acc"] = a5
    return stats


# -- diff ----------------------------------------------------------------------
def compare(path_a: str, path_b: str, gate: float) -> dict:
    a, b = align(load_scores(path_a), load_scores(path_b))
    if set(a["heads"]) != set(b["heads"]):
        raise ValueError(f"head sets differ: {sorted(a['heads'])} vs {sorted(b['heads'])}")
    sa, sb = finalize(a), finalize(b)
    report = {"left": path_a, "right": path_b, "gate_pct_points": gate, "metrics": {}}
    worst = 0.0
    for k in sorted(sa):
        d = sa[k] - sb[k]
        worst = max(worst, abs(d))
        report["metrics"][k] = {
            "left": round(sa[k], 4), "right": round(sb[k], 4),
            "delta": round(d, 4),
        }
    # score-level agreement (diagnostics, not gated: ensembling order and
    # dtype make small numeric diffs expected even at exact parity)
    agree = {}
    for name in a["heads"]:
        pa, la = a["heads"][name]
        pb, lb = b["heads"][name]
        if pa.shape == pb.shape:
            agree[name] = {
                "argmax_agreement_pct": round(
                    100.0 * (pa.argmax(1) == pb.argmax(1)).mean(), 3
                ),
                "mean_abs_score_diff": float(np.abs(pa - pb).mean()),
                "labels_match": bool(np.array_equal(la, lb)),
            }
    report["agreement"] = agree
    report["worst_delta"] = round(worst, 4)
    report["pass"] = bool(worst <= gate)
    return report


def pair_files(left: str, right: str) -> list:
    if os.path.isfile(left):
        return [(left, right)]
    pairs = []
    for name in sorted(os.listdir(left)):
        if name.endswith(".pkl") and os.path.exists(os.path.join(right, name)):
            pairs.append((os.path.join(left, name), os.path.join(right, name)))
    if not pairs:
        raise ValueError(f"no same-named .pkl pairs under {left} / {right}")
    return pairs


# -- self-test -----------------------------------------------------------------
def self_test() -> None:
    """Synthetic-data check of every moving part: schema adapters, id
    alignment, the reference finalization arithmetic, and the gate."""
    rng = np.random.default_rng(0)
    n, cv, cn = 64, 10, 20
    vp = rng.standard_normal((n, cv))
    np_ = rng.standard_normal((n, cn))
    vl = rng.integers(0, cv, n)
    nl = rng.integers(0, cn, n)
    ids = [f"nar_{i:03d}" for i in range(n)]

    # known-answer finalization: label scores floored (top-1 AND top-5 miss
    # everywhere), then planted into top-1 for exactly 75% of rows
    planted = vp.copy()
    planted[np.arange(n), vl] = -1e9
    hit = rng.permutation(n)[: int(0.75 * n)]
    planted[hit, vl[hit]] = 100.0
    t1 = topk_accuracies(planted, vl)[0]
    assert abs(t1 - 100.0 * len(hit) / n) < 1e-9, t1
    # multitask <= min(single heads), == when one head is always right
    always = np.zeros((n, cv)); always[np.arange(n), vl] = 1.0
    a1 = multitask_topk_accuracies((always, planted), (vl, vl))[0]
    assert abs(a1 - t1) < 1e-9

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        repo = os.path.join(td, "repo.pkl")
        ref = os.path.join(td, "ref.pkl")
        perm = rng.permutation(n)  # different iteration orders
        with open(repo, "wb") as f:
            pickle.dump({
                "verb_output": vp, "noun_output": np_,
                "labels": {"verb": vl, "noun": nl}, "narration_id": ids,
            }, f)
        with open(ref, "wb") as f:
            pickle.dump({
                "verb_output": vp[perm], "verb_labels": vl[perm],
                "noun_output": np_[perm], "noun_labels": nl[perm],
                "narration_id": [ids[i] for i in perm],
            }, f)
        rep = compare(repo, ref, gate=0.1)
        assert rep["pass"] and rep["worst_delta"] == 0.0, rep
        assert all(v["labels_match"] for v in rep["agreement"].values())
        assert all(
            v["argmax_agreement_pct"] == 100.0 for v in rep["agreement"].values()
        )

        # a 2-point top-1 regression must fail the 0.1 gate: break argmax on
        # rows where verb was right (guaranteed-win logits, then zero them)
        vp2 = vp.copy()
        right = vp.argmax(1) == vl
        idx = np.where(right)[0][: max(2, int(0.02 * n))]
        vp2[idx] = 0.0
        vp2[idx, (vl[idx] + 1) % cv] = 1.0
        bad = os.path.join(td, "bad.pkl")
        with open(bad, "wb") as f:
            pickle.dump({
                "verb_output": vp2, "noun_output": np_,
                "labels": {"verb": vl, "noun": nl}, "narration_id": ids,
            }, f)
        rep = compare(repo, bad, gate=0.1)
        assert not rep["pass"], rep

        # single-task schema pair (repo 'output' vs reference 'scores')
        s1, s2 = os.path.join(td, "s1.pkl"), os.path.join(td, "s2.pkl")
        with open(s1, "wb") as f:
            pickle.dump({"output": np_, "labels": nl}, f)
        with open(s2, "wb") as f:
            pickle.dump({"scores": np_, "labels": nl}, f)
        rep = compare(s1, s2, gate=0.1)
        assert rep["pass"] and rep["worst_delta"] == 0.0
    print("self-test OK: schemas, alignment, finalization and gate all check out")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("left", nargs="?", help="repo score .pkl (or directory)")
    ap.add_argument("right", nargs="?", help="reference score .pkl (or directory)")
    ap.add_argument("--gate", type=float, default=0.1,
                    help="max |top-k delta| in percentage points (default 0.1)")
    ap.add_argument("--self-test", action="store_true")
    args = ap.parse_args(argv)
    if args.self_test:
        self_test()
        return 0
    if not (args.left and args.right):
        ap.error("left and right required unless --self-test")
    ok = True
    try:
        for pa, pb in pair_files(args.left, args.right):
            rep = compare(pa, pb, args.gate)
            print(json.dumps(rep, indent=2))
            ok &= rep["pass"]
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
