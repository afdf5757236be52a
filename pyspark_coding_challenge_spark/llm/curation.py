"""End-to-end corpus curation — the composite an LLM training-data pipeline
actually runs, as ONE oracle-checked operator chain:

    quality filter  ->  exact dedup  ->  MinHash-LSH near-dup removal

* **Quality filter**: exact integer predicates (word count, char length) so
  both engines agree bit-for-bit — the stand-in for the richer scorers in
  ``llm/text.py`` (their thresholds are floats; curation gates must be
  reproducible, so the gate here is integral by design).
* **Exact dedup**: keep-lowest-doc_id per ``md5(text)`` group — shuffle key
  is the digest, never the body.
* **Near-dup removal**: the banded MinHash candidate generator + exact
  Jaccard verify from ``llm/dedup.py`` over the already-filtered corpus,
  then the greedy keep-lowest-id policy: drop every ``doc_b`` of a verified
  pair (pairs are emitted with ``doc_a < doc_b``). Greedy-by-pairs is the
  standard union-find-free policy at scale — deterministic, one anti-join,
  no iterative connectivity — and both engines apply it identically.

Scale shape: two hash-key shuffles (md5 group, LSH bands) + one anti-join;
candidate pairs only ever form inside band buckets. Every stage is the
100 TB-safe version of itself, and the WHOLE chain is DuckDB-oracle-checked
via the shared portable-hash CTEs (``dedup.minhash_pair_ctes``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_coding_challenge_spark.llm.dedup import (
    JACCARD_THRESHOLD,
    lsh_candidate_pairs,
    minhash_pair_ctes,
    verify_jaccard,
)
from pyspark_coding_challenge_spark.sources.readers import read_table

MIN_WORDS = 5     # quality gate: at least 5 whitespace tokens
MIN_CHARS = 20    # and at least 20 characters


def curate_corpus(docs: DataFrame) -> DataFrame:
    """The curation chain over a (doc_id, text, source) relation; returns
    surviving docs with exact token/char counts."""
    q = docs.filter(
        (F.size(F.split(F.col("text"), " ")) >= MIN_WORDS)
        & (F.length("text") >= MIN_CHARS)
    )
    keepers = (
        q.groupBy(F.md5("text").alias("_md5"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = q.join(keepers, on="doc_id", how="left_semi")
    near = verify_jaccard(kept, lsh_candidate_pairs(kept)).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
    drops = near.select(F.col("doc_b").alias("doc_id")).distinct()
    return (
        kept.join(drops, on="doc_id", how="left_anti")
        .select(
            "doc_id",
            "source",
            F.size(F.split(F.col("text"), " ")).cast("int").alias("token_cnt"),
            F.length("text").cast("int").alias("char_len"),
        )
    )


def llm_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curate_corpus(read_table(spark, sf_dir, "documents"))


def _curation_oracle() -> str:
    return f"""
WITH q AS (
  SELECT doc_id, text, source FROM documents
  WHERE len(string_split(text, ' ')) >= {MIN_WORDS} AND length(text) >= {MIN_CHARS}
),
keep1 AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
kept AS (SELECT q.* FROM q JOIN keep1 USING (doc_id)),
{minhash_pair_ctes('kept')},
drops AS (SELECT DISTINCT doc_b AS doc_id FROM verified WHERE jac >= {JACCARD_THRESHOLD})
SELECT doc_id, source,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS token_cnt,
       CAST(length(text) AS INTEGER) AS char_len
FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM drops)
"""


def register_all(register) -> None:
    register("llm_corpus_curation", llm_corpus_curation, _curation_oracle())
