#!/usr/bin/env python
"""Per-SECTION timing for merged slugs (guide §1: isolate the expensive
query before touching it). For each requested slug, times every section's
query function separately with the noop sink — one untimed warm-up, then
best-of-N — in a single bench-shaped session.

Usage: python scripts/bench_sections.py <slug> [slug ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (bench.py contract).

This is a diagnostic harness, NOT the driver bench: it never replaces
bench.py's numbers, it only tells us where a merged slug's seconds go.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("SPARK_GRAFT_SECTION_REPS", "2"))

    from pyspark_coding_challenge_spark import registry  # noqa: F401 — populates
    from pyspark_coding_challenge_spark.session import get_spark

    def parts_for(slug: str):
        """The merged query fn closes over its ``parts`` list
        (plans/merge.py::merged_query) — read it back out of the closure
        so every merged slug is introspectable without a hand-kept map."""
        fn = registry.queries()[slug]
        if fn.__closure__:
            for cell in fn.__closure__:
                v = cell.cell_contents
                if (isinstance(v, list) and v
                        and isinstance(v[0], tuple) and len(v[0]) == 2
                        and isinstance(v[0][0], str) and callable(v[0][1])):
                    return v
        return [("<whole>", fn)]

    spark = get_spark(app_name="bench_sections", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict[str, float]] = {}
    for slug in sys.argv[1:]:
        parts = parts_for(slug)
        out[slug] = {}
        for name, fn in parts:
            spark.sparkContext.setJobDescription(f"{slug}:{name}")
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            out[slug][name] = round(best, 3)
            print(slug, name, out[slug][name], flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
