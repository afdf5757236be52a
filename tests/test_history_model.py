"""Model-based randomized testing of the sequence-feature core (SURVEY
§5.3-3): for random action sets, both history implementations must agree
with a pure-Python reference model, and every output must satisfy the
contract invariants — length exactly K, zero-suffix padding, strict
no-leakage (all history before the cutoff day), most-recent-first order.

Scenarios are batched into one DataFrame per seed (one Spark job validates
~60 random cases) — far faster than example-at-a-time property testing."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest

from pyspark_coding_challenge_spark.operators.history import (
    last_k_history,
    rolling_last_k_history,
)

ACTIONS_DDL = "customer_id BIGINT, action_time TIMESTAMP, item_id BIGINT, action_type INT"
CUTOFFS_DDL = "customer_id BIGINT, cutoff_ts TIMESTAMP"

K = 4
BASE = datetime(2025, 3, 1)


def _gen(seed: int):
    """~60 random customers with random action histories and 1-3 random
    day-granular cutoffs each. Timestamp ties and same-day actions are
    generated on purpose."""
    rng = random.Random(seed)
    actions, cutoffs = [], []
    for cust in range(1, 61):
        n_act = rng.randint(0, 12)
        for _ in range(n_act):
            day = rng.randint(0, 14)
            # coarse second grid -> frequent exact-timestamp ties
            sec = rng.choice([0, 3600, 3600, 43200, 86399])
            ts = BASE + timedelta(days=day, seconds=sec)
            actions.append((cust, ts, rng.randint(1, 9), rng.randint(1, 3)))
        for _ in range(rng.randint(1, 3)):
            cutoffs.append((cust, BASE + timedelta(days=rng.randint(0, 15))))
    return actions, sorted(set(cutoffs))


def _model(actions, cutoffs, k):
    """Pure-Python reference: per (cust, cutoff), qualifying actions sorted
    (time desc, item asc, type asc), truncated to k, zero-padded."""
    out = {}
    for cust, cut in cutoffs:
        qual = [(ts, item, typ) for (c, ts, item, typ) in actions
                if c == cust and ts < cut]
        if not qual:
            continue  # inner semantics: zero-history rows absent
        qual.sort(key=lambda a: (-a[0].timestamp(), a[1], a[2]))
        qual = qual[:k]
        items = [a[1] for a in qual] + [0] * (k - len(qual))
        types = [a[2] for a in qual] + [0] * (k - len(qual))
        out[(cust, str(cut))] = (tuple(items), tuple(types))
    return out


@pytest.mark.parametrize("seed", [11, 42, 2026])
@pytest.mark.parametrize("impl", [last_k_history, rolling_last_k_history])
def test_history_matches_python_model(spark, seed, impl):
    actions, cutoffs = _gen(seed)
    adf = spark.createDataFrame(actions, schema=ACTIONS_DDL)
    cdf = spark.createDataFrame(cutoffs, schema=CUTOFFS_DDL)

    got = {
        (r.customer_id, str(r.cutoff_ts)): (tuple(r.actions), tuple(r.action_types))
        for r in impl(adf, cdf, k=K).collect()
    }
    want = _model(actions, cutoffs, K)
    assert got == want

    # contract invariants on every produced row
    for (items, types) in got.values():
        assert len(items) == K and len(types) == K
        # zero-suffix padding: nothing non-pad after the first pad
        if 0 in items:
            first_pad = items.index(0)
            assert all(x == 0 for x in items[first_pad:])
            assert all(t == 0 for t in types[first_pad:])
        # parallel arrays pad together
        assert [i == 0 for i in items] == [t == 0 for t in types]
