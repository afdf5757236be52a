"""Bucketed-table layout: the pay-the-shuffle-once join, plan-asserted.

Two tables bucketed on the join key with equal bucket counts must
sort-merge-join with ZERO exchanges (the bucketed scans satisfy the
hash-partitioning requirement), and with sortBy metadata the per-partition
sort disappears too.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_coding_challenge_spark.sources.readers import read_table
from pyspark_coding_challenge_spark.sources.writers import write_bucketed_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_shuffles_nothing(spark, tmp_path, no_broadcast):
    o = read_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed_table(o, "orders_bkt", ("o_orderkey",), 4,
                         sort_cols=("o_orderkey",), path=str(tmp_path / "o"))
    write_bucketed_table(li, "lineitem_bkt", ("l_orderkey",), 4,
                         sort_cols=("l_orderkey",), path=str(tmp_path / "li"))
    try:
        ob, lib = spark.table("orders_bkt"), spark.table("lineitem_bkt")
        j = ob.join(lib, ob.o_orderkey == lib.l_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketed scans co-locate the join
        # and the same join over plain parquet DOES shuffle both sides
        plain = read_table(spark, SF_DIR, "orders").select("o_orderkey").join(
            read_table(spark, SF_DIR, "lineitem").select("l_orderkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert plain_plan.count("Exchange") == 2
        # values agree with the unbucketed join
        assert j.count() == read_table(spark, SF_DIR, "orders").join(
            read_table(spark, SF_DIR, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        ).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
