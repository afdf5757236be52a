#!/usr/bin/env python
"""Scale probe: measure the heavy LLM kernels at 1x/2x/5x/10x the sf0.1
corpus and report wall-time ratios, emitted as ``SCALE_PROBE_r{N}.json``.

Why: the round bench pins absolute cost at one scale factor; the 100 TB
claim is about HOW COST GROWS. This probe synthesizes larger corpora by
replicating the sf0.1 documents table with disjoint doc_ids and
replica-tagged tokens (distinct docs — no artificial mega-dup structure, so
the pair graph stays sparse and the measurement isolates the chain's
throughput, not pathological pair growth; the mega-bucket guard has its own
adversarial test). A scale-safe plan should grow ~linearly in rows here:
every probed kernel is shuffle-keyed by hash/doc_id with map-side combining,
so doubling rows should roughly double time, not square it.

Synthetic data lives under /tmp (never /root/testdata). Usage:
``python scripts/scale_probe.py [round_number]``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPLICAS = (1, 2, 5, 10)
BASE_SF = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_scale_probe"


def build_corpus(spark, factor: int) -> str:
    """documents.parquet replicated ``factor`` times: disjoint doc_ids,
    tokens prefixed with the replica id (distinct shingles per replica)."""
    from pyspark.sql import functions as F

    out = f"{WORK}/sf0.1x{factor}"
    if os.path.exists(out):
        return out
    base = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    n = base.count()
    parts = []
    for i in range(factor):
        rep = base.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            # retag every token so replicas share no shingles (regex is one
            # codegen pass; the probe measures the downstream chain)
            F.regexp_replace(F.col("text"), r"(^| )", f"$1r{i}_").alias("text"),
            "lang", "source", "n_chars",
        )
        parts.append(rep)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print(f"built x{factor}: {n * factor} rows", file=sys.stderr)
    return out


def probe(spark, sf_dir: str) -> dict[str, float]:
    """Time the heavy kernels once each (noop sink, nothing collected).
    lsh_candidate_pairs materializes eagerly at construction, so its
    builder runs INSIDE the timer."""
    from pyspark.sql import functions as F

    from pyspark_coding_challenge_spark.llm import dedup as D
    from pyspark_coding_challenge_spark.llm import text as T

    timings: dict[str, float] = {}

    def run(name, build):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # span_dup consults a session cache (text.shared_span_starts_for_dir);
    # clear it so every factor times the full chain (and earlier factors'
    # persisted relations don't pressure later, larger ones)
    T.clear_span_cache(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    run("minhash_verify_chain",
        lambda: D.verify_jaccard(docs, D.lsh_candidate_pairs(docs)))
    run("simhash", lambda: docs.select(
        "doc_id", D.simhash("array_distinct(split(lower(text), ' '))").alias("sig")))
    run("exact_dedup_groups",
        lambda: docs.groupBy(F.md5("text").alias("h")).count())
    run("span_dup", lambda: T.text_span_dup(spark, sf_dir))
    run("rare_tokens", lambda: T.text_rare_tokens(spark, sf_dir))
    run("chunk", lambda: T.text_chunk(spark, sf_dir))
    return timings


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else None
    os.makedirs(WORK, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark_coding_challenge_spark.session import get_spark

    spark = get_spark(app_name="scale_probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    result: dict = {"protocol": "replicated sf0.1 documents, disjoint ids, "
                    "retagged tokens; one timed run per kernel per factor "
                    "after a 1x warm-up", "factors": {}}
    # warm-up at 1x so JIT/codegen ramp doesn't land in the 1x numbers
    probe(spark, build_corpus(spark, 1))
    for f in REPLICAS:
        sf_dir = build_corpus(spark, f)
        result["factors"][str(f)] = probe(spark, sf_dir)

    base = result["factors"]["1"]
    result["ratios_vs_1x"] = {
        f: {k: (round(v[k] / base[k], 2) if base[k] > 0 else None) for k in v}
        for f, v in result["factors"].items()
    }
    out = json.dumps(result)
    print(out)
    if rnd:
        with open(f"SCALE_PROBE_r{rnd}.json", "w") as fh:
            fh.write(out + "\n")
        print(f"wrote SCALE_PROBE_r{rnd}.json", file=sys.stderr)
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
