"""bench.py relay probe-retry loop (VERDICT r4 next-step #1).

Two driver rounds were lost to single-shot probes reading a flapping relay
as down; the retry loop must (a) keep probing through a transient outage,
(b) stop immediately on a RAISING probe (broken install won't heal), and
(c) give up with a clear message when the budget is exhausted."""

import importlib.util
import os
import sys

import pytest


@pytest.fixture(scope="module")
def bench():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
    )
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_retries_through_transient_outage(bench, monkeypatch):
    results = iter(["hang", "hang", None])
    calls = []
    monkeypatch.setattr(bench, "_probe_once", lambda t: calls.append(t) or next(results))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._probe_device(retry_budget_s=600.0) is None
    assert len(calls) == 3


def test_raising_probe_stops_immediately(bench, monkeypatch):
    seq = iter(["hang", "device probe exited rc=1: ImportError"])
    n = []
    monkeypatch.setattr(bench, "_probe_once", lambda t: n.append(1) or next(seq))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    res = bench._probe_device(retry_budget_s=600.0)
    assert res is not None and "ImportError" in res
    assert len(n) == 2, "an erroring probe must not burn the retry budget"


def test_budget_exhaustion_reports_attempts(bench, monkeypatch):
    monkeypatch.setattr(bench, "_probe_once", lambda t: "hang")
    t = [0.0]

    def fake_monotonic():
        return t[0]

    def fake_sleep(s):
        t[0] += s

    monkeypatch.setattr(bench.time, "monotonic", fake_monotonic)
    monkeypatch.setattr(bench.time, "sleep", fake_sleep)
    res = bench._probe_device(retry_budget_s=120.0, per_probe_s=1.0)
    assert res is not None and "never answered" in res
    # the exhausted window must be RECORDED as a relay outage, not a bench bug
    assert bench._fail_code(res) == "relay_down"


def test_fail_code_classification(bench):
    assert bench._fail_code("device probe never answered: 13 attempts over 34 min") == "relay_down"
    assert bench._fail_code("device probe exited rc=1: ImportError") == "probe_error"


def test_probe_once_success_and_failure(bench, monkeypatch):
    """_probe_once against real subprocesses: a trivially-succeeding and a
    raising command (python -c), no jax involved."""
    import subprocess

    real_run = subprocess.run

    def fake_run(cmd, **kw):
        code = cmd[2]
        return real_run(
            [sys.executable, "-c", code.replace("import jax, jax.numpy as jnp; ", "")
             .replace("jnp.sum(jnp.ones((4, 4)))", "16.0")],
            **kw,
        )

    # _probe_once imports subprocess inside the function — patch the module
    monkeypatch.setattr(subprocess, "run", fake_run)
    # success path: the stripped probe prints and exits 0
    assert bench._probe_once(30.0) is None
