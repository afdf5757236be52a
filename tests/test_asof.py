"""Equivalence + semantics tests for the as-of join forms.

The merge form (one shuffle, no pair expansion) is the default; the ranked
form is the semantic reference. They must agree bit-for-bit on any input
with non-null order columns.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pyspark_coding_challenge_spark.operators.asof import asof_join, asof_join_ranked

L_SCHEMA = "k BIGINT, lt BIGINT, lid BIGINT"
R_SCHEMA = "k BIGINT, rt BIGINT, rid BIGINT, payload STRING"


def _random_frames(spark, seed, n_keys=7, n_left=120, n_right=150):
    rng = random.Random(seed)
    lrows = [
        (rng.randrange(n_keys), rng.randrange(40), i)
        for i in range(n_left)
    ]
    rrows = [
        (rng.randrange(n_keys), rng.randrange(40), i, f"p{i}")
        for i in range(n_right)
    ]
    return (
        spark.createDataFrame(lrows, L_SCHEMA),
        spark.createDataFrame(rrows, R_SCHEMA),
    )


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_and_ranked_forms_agree_on_random_data(spark):
    """Ties everywhere by construction (times drawn from a small range):
    the strict-inequality and deterministic-tiebreak behavior must match."""
    for seed in (1, 2, 3):
        l, r = _random_frames(spark, seed)
        merged = asof_join(l, r, on="k", left_order=("lt", "lid"),
                           right_order=("rt", "rid"))
        ranked = asof_join_ranked(l, r, on="k", left_order=("lt", "lid"),
                                  right_order=("rt", "rid"))
        assert _canon(merged) == _canon(ranked)


def test_inner_drops_unmatched_and_left_keeps_them(spark):
    l = spark.createDataFrame([(1, 10, 0), (1, 5, 1), (2, 10, 2)], L_SCHEMA)
    r = spark.createDataFrame([(1, 7, 0, "a")], R_SCHEMA)
    left = asof_join(l, r, on="k", left_order=("lt", "lid"),
                     right_order=("rt", "rid"))
    assert {(row.lid, row.payload) for row in left.collect()} == {
        (0, "a"), (1, None), (2, None)
    }
    inner = asof_join(l, r, on="k", left_order=("lt", "lid"),
                      right_order=("rt", "rid"), how="inner")
    assert {(row.lid, row.payload) for row in inner.collect()} == {(0, "a")}


def test_equal_order_right_row_is_excluded_strictly(spark):
    l = spark.createDataFrame([(1, 10, 0)], L_SCHEMA)
    r = spark.createDataFrame(
        [(1, 10, 5, "same_t"), (1, 9, 9, "earlier")], R_SCHEMA
    )
    out = asof_join(l, r, on="k", left_order=("lt",), right_order=("rt",)).collect()
    assert out[0].payload == "earlier"


def test_merge_form_has_no_per_key_pair_expansion(spark):
    """Plan shape: the merge form is union -> single hash exchange on the
    key -> window; no join node at all."""
    l, r = _random_frames(spark, 4)
    df = asof_join(l, r, on="k", left_order=("lt", "lid"), right_order=("rt", "rid"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_mismatched_order_tuples_raise_instead_of_truncating(spark):
    """zip() would silently pair the tiebreak column against the time column
    (or leave trailing NULL order columns sorting NULLS FIRST) — both forms
    must refuse mismatched order tuples loudly."""
    import pytest

    from pyspark_coding_challenge_spark.operators.asof import asof_join, asof_join_ranked

    l = spark.createDataFrame([(1, 1, 1)], "k BIGINT, t BIGINT, tb BIGINT")
    r = spark.createDataFrame([(1, 1)], "k BIGINT, t BIGINT")
    with pytest.raises(ValueError, match="same\\s+length"):
        asof_join(l, r, "k", ("t", "tb"), ("t",))
    with pytest.raises(ValueError, match="same\\s+length"):
        asof_join_ranked(l, r, "k", ("t", "tb"), ("t",))
    with pytest.raises(ValueError):
        asof_join(l, r, "k", (), ())


def test_null_keys_match_nothing_in_both_forms(spark):
    """Equi-join semantics for NULL keys (round-5 review fix): a NULL-keyed
    right row must never match, and a NULL-keyed left row gets a NULL
    payload — identically in the merge and ranked forms (the merge form's
    window partitionBy would otherwise GROUP the nulls together)."""
    left = spark.createDataFrame(
        [(None, 10, 1), (1, 10, 2)], L_SCHEMA)
    right = spark.createDataFrame(
        [(None, 5, 1, "null-key"), (1, 5, 2, "real")], R_SCHEMA)
    for fn in (asof_join, asof_join_ranked):
        got = {r.lid: r.payload for r in fn(
            left, right, on="k",
            left_order=("lt", "lid"), right_order=("rt", "rid")).collect()}
        assert got == {1: None, 2: "real"}, (fn.__name__, got)


def test_unsupported_how_raises_before_ranked_delegation(spark):
    """how='outer' must raise up front even when right_within routes to the
    ranked form (which would otherwise emit bogus all-NULL-left rows)."""
    import pytest

    left, right = _random_frames(spark, 1)
    with pytest.raises(ValueError, match="how"):
        asof_join(left, right, on="k",
                  left_order=("lt", "lid"), right_order=("rt", "rid"),
                  how="outer", right_within=(F.col("lt") - F.col("rt") < 10))


def test_rolling_history_ignores_null_entities(spark):
    """round-5 review fix: NULL-entity actions must not accumulate history
    for NULL-entity cutoffs (the join form's equi-join never matches them)."""
    from datetime import datetime

    from pyspark_coding_challenge_spark.operators.history import (
        rolling_last_k_history,
    )

    actions = spark.createDataFrame(
        [(None, datetime(2024, 1, 1, 10), 100, 1),
         (7, datetime(2024, 1, 1, 10), 200, 1)],
        "customer_id BIGINT, action_time TIMESTAMP, item_id BIGINT, action_type INT")
    cutoffs = spark.createDataFrame(
        [(None, datetime(2024, 1, 2)), (7, datetime(2024, 1, 2))],
        "customer_id BIGINT, cutoff_ts TIMESTAMP")
    rows = rolling_last_k_history(
        actions, cutoffs, k=3, entity_col="customer_id",
        time_col="action_time", cutoff_col="cutoff_ts",
        payload_cols=("item_id", "action_type"),
        out_cols=("items", "types"), pad=0,
    ).collect()
    # entity 7 gets its one action; the NULL entity emits NO history row
    # (empty histories are dropped; the downstream left join pads them)
    assert {r.customer_id for r in rows} == {7}
    assert rows[0].items == [200, 0, 0]


def test_reserved_working_names_fail_loudly(spark):
    """r10 review: a left column named '_asof_m' was silently overwritten
    by the merge form's carried-match struct — reserved names now raise."""
    import pytest
    from pyspark.sql import functions as F

    from pyspark_coding_challenge_spark.operators.asof import asof_join

    left = spark.range(3).select(
        F.col("id").alias("k"), F.col("id").alias("t"),
        F.lit("x").alias("_asof_m"),
    )
    right = spark.range(3).select(
        F.col("id").alias("k"), F.col("id").alias("rt"),
        F.lit(1.0).alias("payload"),
    )
    with pytest.raises(ValueError, match="_asof_m"):
        asof_join(left, right, on="k", left_order=("t",), right_order=("rt",))
