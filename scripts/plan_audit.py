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
    # int-validate BEFORE the minutes of plan building (same rationale as
    # bench_isolated): a typo like 'r5' must not silently write a
    # misnamed artifact outside the per-round convention
    rnd = None
    if len(sys.argv) > 1:
        try:
            rnd = int(sys.argv[1])
        except ValueError:
            print(f"round argument must be an integer, got {sys.argv[1]!r}",
                  file=sys.stderr)
            raise SystemExit(2)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # the shared builder, not a hand-rolled session: audited plans must be
    # built under the same confs (AQE, maxPartitionBytes, UTC, nanosAsLong)
    # every bench/oracle/probe session runs with
    from pyspark_coding_challenge_spark.session import get_spark

    spark = get_spark(app_name="plan_audit", master="local[8]", shuffle_partitions=8)
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
