"""Golden tests ported from the reference's test intent
(``pyspark-coding-challenge/tests/test_pipeline.py:62-137`` / FIXTURES.md §A6),
with explicit DDL schemas (the reference's inferred ones break on Spark 4.x).

Expected values follow the DOCUMENTED contract — including the 3rd row for the
zero-history customer that the reference's inner-join bug drops (SURVEY §4.4-2).
"""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark_coding_challenge_spark import schemas
from pyspark_coding_challenge_spark.plans.training import produce_training_examples


def ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


@pytest.fixture()
def golden_inputs(spark):
    impressions = spark.createDataFrame(
        [
            ("2025-08-14", "r1", 1, [(100, False), (200, True)]),
            ("2025-08-14", "r2", 2, [(300, False)]),
        ],
        schema=schemas.IMPRESSIONS_DDL,
    )
    clicks = spark.createDataFrame(
        [
            ("2025-08-13", 1, 10, ts("2025-08-13 12:00:00")),
            # same-day click -> excluded by no-leakage rule
            ("2025-08-14", 1, 999, ts("2025-08-14 01:00:00")),
        ],
        schema=schemas.CLICKS_DDL,
    )
    carts = spark.createDataFrame(
        [("2025-07-01", 1, 20, 7, ts("2025-07-01 09:00:00"))],
        schema=schemas.ADD_TO_CARTS_DDL,
    )
    orders = spark.createDataFrame(
        [("2024-12-01", 1, 30, 7, ts("2024-12-01 17:00:00"))],
        schema=schemas.ORDERS_ACTIONS_DDL,
    )
    return impressions, clicks, carts, orders


def test_basic_history_extraction(spark, golden_inputs):
    out = produce_training_examples(*golden_inputs, max_history=5)
    rows = {
        (r.customer_id, r.impression_pos): r
        for r in out.collect()
    }
    assert len(rows) == 3  # the reference's own asserted count (test_pipeline.py:100)

    r = rows[(1, 0)]
    assert r.impression_item_id == 100 and r.label == 0
    assert r.actions == [10, 20, 30, 0, 0]       # recency order, same-day 999 excluded
    assert r.action_types == [1, 2, 3, 0, 0]

    r = rows[(1, 1)]
    assert r.impression_item_id == 200 and r.label == 1
    assert r.actions == [10, 20, 30, 0, 0]

    # zero-history customer: present, all-pad arrays (README.md:21)
    r = rows[(2, 0)]
    assert r.impression_item_id == 300 and r.label == 0
    assert r.actions == [0, 0, 0, 0, 0]
    assert r.action_types == [0, 0, 0, 0, 0]


def test_output_schema(spark, golden_inputs):
    out = produce_training_examples(*golden_inputs, max_history=5)
    assert out.schema.simpleString() == (
        "struct<dt:string,ranking_id:string,customer_id:bigint,"
        "impression_pos:int,impression_item_id:bigint,label:int,"
        "actions:array<bigint>,action_types:array<int>>"
    )


def test_truncation_and_padding(spark):
    # 7 clicks on ascending days, max_history=5 -> 5 most recent, descending.
    impressions = spark.createDataFrame(
        [("2025-08-14", "r1", 1, [(100, False)])],
        schema=schemas.IMPRESSIONS_DDL,
    )
    clicks = spark.createDataFrame(
        [
            ("2025-08-0%d" % (i + 1), 1, 1000 + i, ts("2025-08-0%d 10:00:00" % (i + 1)))
            for i in range(7)
        ],
        schema=schemas.CLICKS_DDL,
    )
    carts = spark.createDataFrame([], schema=schemas.ADD_TO_CARTS_DDL)
    orders = spark.createDataFrame([], schema=schemas.ORDERS_ACTIONS_DDL)

    out = produce_training_examples(impressions, clicks, carts, orders, max_history=5)
    [r] = out.collect()
    assert r.actions == [1006, 1005, 1004, 1003, 1002]
    assert r.action_types == [1, 1, 1, 1, 1]


def test_empty_and_null_impression_arrays_survive(spark):
    impressions = spark.createDataFrame(
        [
            ("2025-08-14", "r1", 1, []),
            ("2025-08-14", "r2", 2, None),
            ("2025-08-14", None, 3, [(5, None)]),  # null ranking_id, null is_order
        ],
        schema=schemas.IMPRESSIONS_DDL,
    )
    empty_clicks = spark.createDataFrame([], schema=schemas.CLICKS_DDL)
    carts = spark.createDataFrame([], schema=schemas.ADD_TO_CARTS_DDL)
    orders = spark.createDataFrame([], schema=schemas.ORDERS_ACTIONS_DDL)

    out = produce_training_examples(impressions, empty_clicks, carts, orders, max_history=3)
    rows = {r.customer_id: r for r in out.collect()}
    assert len(rows) == 3
    # posexplode_outer keeps NULL/empty arrays with NULL item columns
    assert rows[1].impression_item_id is None and rows[1].impression_pos is None
    assert rows[2].impression_item_id is None
    # null is_order -> label 0; null ranking_id carried through
    assert rows[3].label == 0 and rows[3].ranking_id is None
    assert rows[3].actions == [0, 0, 0]


def test_null_actions_dropped_and_ties_deterministic(spark):
    impressions = spark.createDataFrame(
        [("2025-08-14", "r1", 1, [(100, False)])],
        schema=schemas.IMPRESSIONS_DDL,
    )
    t = ts("2025-08-10 10:00:00")
    clicks = spark.createDataFrame(
        [
            ("2025-08-10", 1, 7, t),      # tie on timestamp with item 3
            ("2025-08-10", 1, 3, t),
            ("2025-08-10", None, 1, t),   # null customer -> dropped
            ("2025-08-10", 1, None, t),   # null item -> dropped
            ("2025-08-10", 1, 9, None),   # null time -> dropped
        ],
        schema=schemas.CLICKS_DDL,
    )
    carts = spark.createDataFrame([], schema=schemas.ADD_TO_CARTS_DDL)
    orders = spark.createDataFrame([], schema=schemas.ORDERS_ACTIONS_DDL)

    out = produce_training_examples(impressions, clicks, carts, orders, max_history=4)
    [r] = out.collect()
    # equal timestamps -> secondary sort by item_id ascending (SURVEY §4.4-3)
    assert r.actions == [3, 7, 0, 0]
    assert r.action_types == [1, 1, 0, 0]
