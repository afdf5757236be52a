"""Flagship query vs DuckDB oracle at sf0.001 — local replica of the driver's
correctness gate."""

from __future__ import annotations

from pyspark_coding_challenge_spark import registry
from tests.oracle import assert_matches_oracle

SF_DIR = "/root/testdata/sf0.001"


def test_flagship_matches_oracle(spark):
    q = registry.queries()["user_history_topk"]
    sql = registry.oracle_sql()["user_history_topk"]
    assert_matches_oracle(q(spark, SF_DIR), sql, SF_DIR)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = [f.name for f in df.schema.fields]
    assert names == ["event_id", "user_id", "dt", "actions", "action_types"]
