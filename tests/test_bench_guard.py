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
