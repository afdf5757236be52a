#!/usr/bin/env python
"""Plan-shape audit: one row per registered slug with the physical-plan
node counts that matter at 100 TB — parquet scans, shuffle exchanges,
broadcast exchanges, joins by strategy, aggregates, windows, Python
evaluation nodes — emitted as ``PLAN_AUDIT_r{N}.json``.

Why: the plan-quality tests pin specific properties of specific queries;
this audit is the blanket census. A future round can diff two audits to
catch a plan regression (a new Exchange, a lost broadcast, a Python node
sneaking in) in ANY slug, including ones no targeted gate covers.

Streaming slugs are skipped (building their plan executes real streams).
Usage: ``python scripts/plan_audit.py [round_number]``.
"""

from __future__ import annotations

import json
import os
import re
import sys

COUNTED = {
    "parquet_scans": r"Scan parquet",
    "rdd_scans": r"Scan ExistingRDD",
    "shuffle_exchanges": r"Exchange hashpartitioning",
    "range_exchanges": r"Exchange rangepartitioning",
    "roundrobin_exchanges": r"Exchange RoundRobinPartitioning",
    "broadcast_exchanges": r"BroadcastExchange",
    "broadcast_hash_joins": r"BroadcastHashJoin",
    "sort_merge_joins": r"SortMergeJoin",
    "shuffled_hash_joins": r"ShuffledHashJoin",
    "broadcast_nl_joins": r"BroadcastNestedLoopJoin",
    "cartesian_products": r"CartesianProduct",
    "hash_aggregates": r"HashAggregate",
    "windows": r"\bWindow\b",
    "window_group_limits": r"WindowGroupLimit",
    "take_ordered": r"TakeOrderedAndProject",
    "python_row_udfs": r"BatchEvalPython",
    "python_arrow_udfs": r"ArrowEvalPython|MapInPandas",
    "in_memory_scans": r"InMemoryTableScan",
}


def audit_plan(plan: str) -> dict[str, int]:
    return {k: len(re.findall(rx, plan)) for k, rx in COUNTED.items()}


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else None
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark_coding_challenge_spark import registry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out: dict[str, dict] = {}
    for slug, fn in registry.queries().items():
        if slug.startswith("streaming_"):
            out[slug] = {"skipped": "building the plan executes real streams"}
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # surfaced in the oracle suite; recorded here
            out[slug] = {"error": str(ex)[:200]}
            continue
        counts = audit_plan(plan)
        out[slug] = {k: v for k, v in counts.items() if v}
    result = {"sf": sf_dir, "note": "initial (pre-AQE) physical plans; "
              "zero-count keys omitted. CAVEAT: InMemoryTableScan nodes "
              "print their cached plan fragment, so slugs with "
              "in_memory_scans > 0 (persisted training loops like "
              "embedding_ann_ivf) over-count parquet_scans/exchanges — at "
              "runtime the cache serves those subtrees once.", "slugs": out}
    line = json.dumps(result)
    print(line)
    if rnd:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f"PLAN_AUDIT_r{rnd}.json",
        )
        with open(path, "w") as f:
            f.write(line + "\n")
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
