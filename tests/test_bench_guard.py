"""No-concurrent-load guard for the paired bench (r12 judge item #4).

Two rounds running (r10, r12) the paired A/B bench overlapped the
builder's own pytest/oracle jobs and needed idle re-measures; the rule now
lives in ``scripts/bench_isolated.py`` as code. These tests pin the
guard's contract with a mocked loadavg — no Spark, no sleeping."""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench_isolated():
    spec = importlib.util.spec_from_file_location(
        "bench_isolated", os.path.join(REPO, "scripts", "bench_isolated.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_idle_machine_passes_immediately():
    b = _bench_isolated()
    sleeps: list[float] = []
    rec = b.wait_for_idle(16.0, _getloadavg=lambda: (3.2, 0, 0),
                          _sleep=sleeps.append)
    assert rec == {"loadavg1": 3.2, "load_waited_s": 0.0,
                   "load_exceeded": False}
    assert sleeps == []


def test_loaded_machine_waits_then_proceeds():
    """Load clears after two sleeps: the guard retries, then records the
    loadavg the measurement actually started under."""
    b = _bench_isolated()
    seq = iter([(40.0, 0, 0), (25.0, 0, 0), (5.0, 0, 0)])
    sleeps: list[float] = []
    rec = b.wait_for_idle(16.0, retries=8, sleep_s=30.0,
                          _getloadavg=lambda: next(seq),
                          _sleep=sleeps.append)
    assert rec == {"loadavg1": 5.0, "load_waited_s": 60.0,
                   "load_exceeded": False}
    assert sleeps == [30.0, 30.0]


def test_bounded_retries_give_up_flagged():
    """A machine that never goes idle must not deadlock the bench: after
    the bounded retries the row runs anyway, FLAGGED — the artifact field
    is what lets a reviewer discount it (the r10/r12 failure mode was
    silent overlap, not overlap per se)."""
    b = _bench_isolated()
    sleeps: list[float] = []
    rec = b.wait_for_idle(16.0, retries=3, sleep_s=30.0,
                          _getloadavg=lambda: (64.0, 0, 0),
                          _sleep=sleeps.append)
    assert rec == {"loadavg1": 64.0, "load_waited_s": 90.0,
                   "load_exceeded": True}
    assert len(sleeps) == 3


# ---------------------------------------------------------------------------
# auto re-measure for band-exceeding control slugs (r13 verdict item #6)
# ---------------------------------------------------------------------------

def _ab_entry(ratio, scope_changed=False, order="cp"):
    return {"cold": 2.0, "best": ratio, "ab": {
        "order": order, "prev_best": 1.0, "paired_ratio": ratio,
        "scope_changed": scope_changed}}


def test_in_band_control_slug_is_not_remeasured():
    b = _bench_isolated()
    calls = []
    entry = _ab_entry(1.15)
    ran = b.maybe_remeasure_pair(entry, "s", "sf", "32", "/repo",
                                 run_child=lambda *a, **k: calls.append(a))
    assert ran is False and calls == []
    assert "remeasure" not in entry["ab"]


def test_scope_changed_slug_is_never_remeasured():
    """A scope-changed ratio measures scope, not regression — re-running
    it five times would just re-measure the scope change."""
    b = _bench_isolated()
    calls = []
    entry = _ab_entry(2.7, scope_changed=True)
    ran = b.maybe_remeasure_pair(entry, "s", "sf", "32", "/repo",
                                 run_child=lambda *a, **k: calls.append(a))
    assert ran is False and calls == []


def test_band_exceeding_control_slug_gets_five_run_pair():
    """Ratio 1.21 on an unchanged-scope slug: one more paired fresh
    process per tree, best-of-5 each, original numbers kept, re-measure
    appended with its own ratio; tree order preserved from the original
    pair (mocked timers — no Spark, no sleeping)."""
    b = _bench_isolated()
    seen = []

    def fake_child(slug, sf_dir, cpus, cwd, n_runs=3):
        seen.append((cwd, n_runs))
        best = 1.01 if cwd == "/repo" else 1.0
        return {"slug": slug, "cold": 2.0,
                "runs": [best + 0.1, best, best + 0.2], "best": best}

    entry = _ab_entry(1.21, order="pc")
    waits = []
    ran = b.maybe_remeasure_pair(entry, "s", "sf", "32", "/repo",
                                 ab_tree="/prev", run_child=fake_child,
                                 wait_idle=lambda m: waits.append(m) or
                                 {"loadavg1": 1.0}, max_load=16.0)
    assert ran is True
    assert seen == [("/prev", 5), ("/repo", 5)]  # order 'pc' preserved
    assert waits == [16.0]  # the idle guard covered the re-measure window
    ab = entry["ab"]
    assert ab["paired_ratio"] == 1.21          # original verdict kept
    assert ab["remeasured"] is True
    assert ab["remeasure"]["n_runs"] == 5
    assert ab["remeasure"]["paired_ratio"] == 1.01


def test_remeasure_child_failure_is_recorded_not_fatal():
    b = _bench_isolated()
    entry = _ab_entry(0.7)
    ran = b.maybe_remeasure_pair(
        entry, "s", "sf", "32", "/repo",
        run_child=lambda *a, **k: {"error": "child exploded"})
    assert ran is True
    assert entry["ab"]["remeasured"] is False
    assert "child exploded" in entry["ab"]["remeasure_error"]
