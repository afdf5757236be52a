#!/usr/bin/env python
"""Dump .explain("formatted") for every registered slug to plans/<round>/
($SPARK_GRAFT_PLANS_ROUND, default r17).

Usage: python scripts/capture_plans.py <suffix> [slug ...]
Writes plans/<round>/<slug>_<suffix>.txt for each slug (default: all slugs).
Uses the same session shape as bench.py (get_spark at $SPARK_GRAFT_CPUS)
so the captured plan matches what the bench executes.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r17"))
    os.makedirs(out_dir, exist_ok=True)

    from pyspark_coding_challenge_spark import registry
    from pyspark_coding_challenge_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="capture_plans", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    failures = {}
    for slug, fn in registry.queries().items():
        if only and slug not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{slug}_{suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            print(slug, "OK", flush=True)
        except Exception as ex:  # noqa: BLE001 — capture what we can, report the rest
            failures[slug] = str(ex)[:300]
            print(slug, "FAIL", str(ex)[:120], flush=True)
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
