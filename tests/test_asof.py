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
