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

from pyspark.sql import DataFrame, SparkSession, Window
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


def _kept_and_pairs(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Quality-filter + exact-dedup ``docs`` -> ``kept``, then run the LSH
    candidate generator + Jaccard verify ONCE -> ``near`` (verified pairs,
    doc_a < doc_b). Both are checkpointed: ``kept`` feeds four consumers
    (shingling twice, the anti-join, the output projection) and ``near``
    feeds both the removal policy and the cluster audit — materializing each
    once is exactly what a production pipeline does (on a real cluster:
    ``persist``/``checkpoint`` instead of ``localCheckpoint``)."""
    q = docs.filter(
        (F.size(F.split(F.col("text"), " ")) >= MIN_WORDS)
        & (F.length("text") >= MIN_CHARS)
    )
    keepers = (
        q.groupBy(F.md5("text").alias("_md5"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = q.join(keepers, on="doc_id", how="left_semi").localCheckpoint()
    near = (
        verify_jaccard(kept, lsh_candidate_pairs(kept))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    return kept, near


def _curated(kept: DataFrame, near: DataFrame) -> DataFrame:
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


def curate_corpus(docs: DataFrame) -> DataFrame:
    """The curation chain over a (doc_id, text, source) relation; returns
    surviving docs with exact token/char counts."""
    return _curated(*_kept_and_pairs(docs))


def llm_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curate_corpus(read_table(spark, sf_dir, "documents"))


def connected_components(pairs: DataFrame,
                         a_col: str = "doc_a", b_col: str = "doc_b") -> DataFrame:
    """Connected components of an undirected pair graph via hash-min label
    propagation: ``label(v) <- min(label(v), min(label(neighbors)))``
    iterated to fixpoint. Each round is one equi-join + min-aggregate on
    (node, label) rows — never wider than the vertex set. Hash-min needs
    O(graph diameter) rounds; near-dup components are short chains/cliques
    in practice (measured: 2 rounds at sf0.1), and the large-star/small-star
    variant [Kiveris et al., "Connected Components in MapReduce and Beyond"]
    drops it to O(log n) with the same per-round join shape if diameter ever
    bites. ``localCheckpoint`` truncates lineage per round (on a real
    cluster: ``checkpoint()`` to reliable storage).

    Returns (node, component) = (``a_col``'s type, min node id reachable)."""
    edges = (
        pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("t"))
        .union(pairs.select(F.col(b_col).alias("s"), F.col(a_col).alias("t")))
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("s").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("lbl"))
        .localCheckpoint()
    )
    while True:
        nbr_min = (
            edges.join(labels, edges["s"] == labels["v"])
            .groupBy(F.col("t").alias("dst"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        stepped = (
            labels.join(nbr_min, labels["v"] == nbr_min["dst"], "left")
            .select(
                "v",
                F.least(F.col("lbl"), F.coalesce("nbr_lbl", F.col("lbl"))).alias("lbl"),
                # NULL nbr_lbl means no incoming message -> unchanged.
                (F.col("nbr_lbl") < F.col("lbl")).alias("_chg"),
            )
            .localCheckpoint()
        )
        changed = stepped.filter("_chg").count()
        labels = stepped.drop("_chg")
        if changed == 0:
            break
    return labels.select(F.col("v").alias("node"), F.col("lbl").alias("component"))


def corpus_curation_with_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered slug: section ``curated`` = surviving docs (greedy
    near-dup removal), section ``clusters`` = transitive near-dup components
    over the SAME verified pair graph (one row per clustered doc:
    cluster_id = min doc_id in its component, plus the component size).
    Greedy-by-pairs can split a chain a~b, b~c into two decisions;
    components are the policy-free ground truth a curation pipeline audits
    against (e.g. keep exactly one doc per component). The pair graph is
    computed once and shared (``_kept_and_pairs``)."""
    kept, near = _kept_and_pairs(read_table(spark, sf_dir, "documents"))
    curated = _curated(kept, near).select(F.lit("curated").alias("section"), "*")
    clusters = (
        connected_components(near)
        .select(F.col("node").alias("doc_id"), F.col("component").alias("cluster_id"))
        .withColumn("cluster_size", F.count("*").over(Window.partitionBy("cluster_id")))
        .select(F.lit("clusters").alias("section"), "*")
    )
    return curated.unionByName(clusters, allowMissingColumns=True)


_SQL_KEPT_CTES = f"""q AS (
  SELECT doc_id, text, source FROM documents
  WHERE len(string_split(text, ' ')) >= {MIN_WORDS} AND length(text) >= {MIN_CHARS}
),
keep1 AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
kept AS (SELECT q.* FROM q JOIN keep1 USING (doc_id))"""


def _curation_oracle() -> str:
    return f"""
WITH {_SQL_KEPT_CTES},
{minhash_pair_ctes('kept')},
drops AS (SELECT DISTINCT doc_b AS doc_id FROM verified WHERE jac >= {JACCARD_THRESHOLD})
SELECT doc_id, source,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS token_cnt,
       CAST(length(text) AS INTEGER) AS char_len
FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM drops)
"""


def _clusters_oracle() -> str:
    """DuckDB twin of ``connected_components`` over the kept-corpus pair
    graph: a recursive CTE computes full reachability (UNION dedups, so it
    terminates) and min-reachable-id is the component label — the
    declarative equivalent of the hash-min fixpoint."""
    return f"""
WITH RECURSIVE {_SQL_KEPT_CTES},
{minhash_pair_ctes('kept')},
p AS (SELECT doc_a, doc_b FROM verified WHERE jac >= {JACCARD_THRESHOLD}),
e AS (SELECT doc_a AS s, doc_b AS t FROM p UNION SELECT doc_b, doc_a FROM p),
reach(v, r) AS (
  SELECT s, s FROM e
  UNION
  SELECT e2.t, re.r FROM reach re JOIN e e2 ON e2.s = re.v
),
cl AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM cl
"""


def register_all(register) -> None:
    from pyspark_coding_challenge_spark.plans.merge import merged_oracle

    # Curation chain + transitive clusters ride one slug (driver 50-slot
    # cap). Custom merged fn (not register_merged) so both sections share
    # one candidate-pair computation; the oracle unions the per-section SQL
    # exactly like merged_oracle does for ordinary merged slugs.
    register(
        "llm_corpus_curation",
        corpus_curation_with_clusters,
        merged_oracle([
            ("curated", _curation_oracle()),
            ("clusters", _clusters_oracle()),
        ]),
    )
