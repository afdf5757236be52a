"""Data profiling and reproducible sampling for corpus curation.

``data_profile`` is the "analyze table" primitive a 100 TB ingest runs
before anything else: per-column null counts, exact distinct counts, min/max
— one pass over the data, tiny result. ``sample_deterministic`` is the
reproducible sampling primitive: membership decided by a portable content
hash (``md5_fold60``), so the sample is stable across runs, engines, and
partitionings — unlike ``df.sample``, whose RNG is partition-layout
dependent and not portable to an oracle.

Both are pure Catalyst expressions (no Python), both DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_coding_challenge_spark.llm.dedup import md5_fold60, sql_md5_fold60
from pyspark_coding_challenge_spark.llm.text import sql_n_tokens
from pyspark_coding_challenge_spark.sources.readers import read_table

_SQL_NTOK = sql_n_tokens("text")

_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per column of ``documents``: nulls, exact distinct, min/max
    (min/max computed in native type, then cast to string for the uniform
    output schema). Single scan, single aggregate; the multi-distinct
    expands via Catalyst's Expand operator (one shuffle). At 100 TB the
    distinct counts swap to ``approx_count_distinct`` — exact here because
    the oracle checks exact values."""
    d = read_table(spark, sf_dir, "documents")
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = d.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return row.select(
        "n_rows",
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (column_name, null_cnt, distinct_cnt, min_val, max_val)"
        ),
    )


def _profile_branch(c: str) -> str:
    # CAST the sum: DuckDB integer-sum yields HUGEINT, which lands in pandas
    # as float64 and dtype-mismatches Spark's int64 even when values agree.
    return f"""SELECT count(*) AS n_rows, '{c}' AS column_name,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cnt,
       count(DISTINCT {c}) AS distinct_cnt,
       CAST(min({c}) AS VARCHAR) AS min_val,
       CAST(max({c}) AS VARCHAR) AS max_val
FROM documents"""


DATA_PROFILE_ORACLE = "\nUNION ALL BY NAME\n".join(
    _profile_branch(c) for c in _PROFILE_COLS
)

SAMPLE_DENOM = 1 << 60  # md5_fold60 is uniform on [0, 2^60)
UNIFORM_PCT = 10  # keep ~10%
STRATUM_K = 20  # per-source stratified sample size


def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two reproducible samples of ``documents`` in one result:

    * section ``uniform``: keep doc iff ``md5_fold60(doc_id) < 10% of 2^60``
      — a content-addressed Bernoulli sample, stable under repartitioning,
      re-runs, and engine changes; the only correct way to sample
      consistently across a 100 TB multi-job pipeline (every job that
      samples "10%" sees the SAME documents).
    * section ``stratified``: per-source top-K by hash order — exact-size
      per-stratum samples via one window + rank filter. NOT migrated to
      the sharded row_number (an r8 review pass proposed it, and the
      plan-quality gate caught the proposal as a regression): because a
      rank LIMIT follows this window, Spark 4's WindowGroupLimit pushdown
      keeps only K rows per stratum on each MAP task before the shuffle —
      the exchange carries O(strata x K) and the per-source task sorts
      O(K x map_tasks) rows, strictly better than sharding (which
      shuffles the whole corpus to shards plus a quantile pass). The
      sharded form is for rank/cumsum outputs with NO limit
      (batch_plan/token_budget), where nothing can be pushed down —
      gated by tests/test_plan_quality.py (WindowGroupLimit + Partial).
    """
    d = read_table(spark, sf_dir, "documents")
    h = md5_fold60(F.col("doc_id").cast("string"))
    uniform = (
        d.filter(h < SAMPLE_DENOM * UNIFORM_PCT // 100)
        .select(
            F.lit("uniform").alias("sample_kind"),
            "doc_id",
            "source",
            F.lit(None).cast("int").alias("stratum_rank"),
        )
    )
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    stratified = (
        d.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= STRATUM_K)
        .select(
            F.lit("stratified").alias("sample_kind"),
            "doc_id",
            "source",
            F.col("rn").cast("int").alias("stratum_rank"),
        )
    )
    return uniform.unionByName(stratified)


SAMPLE_DETERMINISTIC_ORACLE = f"""
SELECT 'uniform' AS sample_kind, doc_id, source, CAST(NULL AS INTEGER) AS stratum_rank
FROM documents
WHERE {sql_md5_fold60("CAST(doc_id AS VARCHAR)")} < {SAMPLE_DENOM * UNIFORM_PCT // 100}
UNION ALL BY NAME
SELECT 'stratified' AS sample_kind, doc_id, source, CAST(rn AS INTEGER) AS stratum_rank
FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY {sql_md5_fold60("CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
  FROM documents
)
WHERE rn <= {STRATUM_K}
"""


# Exact integer threshold arithmetic for mixture sampling: rates are in
# basis points and the hash is uniform on [0, 2^60), so "keep at r bp" is
# h < r * floor(2^60 / 10000) — all int64, no float boundary ulps, max
# product 10000 * 1.15e14 < 2^63.
_BP_UNIT = (1 << 60) // 10000


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source MIXTURE sampling — the "data mixing" step that turns a raw
    corpus into a training mixture (e.g. upweight books, downweight web):
    each source gets its own keep-rate and membership is decided by the same
    content-addressed hash as ``sample_deterministic``, so the mixture is
    reproducible across runs/engines/partitionings and composes with every
    other hash-gated stage.

    The per-source rate here is derived deterministically from the source
    name (2000-9999 basis points) so the operator exercises heterogeneous
    rates without a config table; a production pipeline broadcast-joins its
    curated rate table instead — the gate expression is identical. The row
    hash is salted ('mix:') to stay independent of the uniform-sample gate.
    """
    d = read_table(spark, sf_dir, "documents")
    rate_bp = (
        F.pmod(md5_fold60(F.col("source")), F.lit(8000)) + F.lit(2000)
    ).cast("bigint")
    h = md5_fold60(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
    return (
        d.select("doc_id", "source", rate_bp.alias("rate_bp"), h.alias("_h"))
        .filter(F.col("_h") < F.col("rate_bp") * F.lit(_BP_UNIT))
        .select("doc_id", "source", "rate_bp")
    )


MIXTURE_SAMPLE_ORACLE = f"""
SELECT doc_id, source, rate_bp FROM (
  SELECT doc_id, source,
         ({sql_md5_fold60('source')} % 8000 + 8000) % 8000 + 2000 AS rate_bp,
         {sql_md5_fold60("'mix:' || CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
)
WHERE h < rate_bp * {_BP_UNIT}
"""


N_SHARDS = 16  # demo shard count; production sizes shards to ~1 GB each


def shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GLOBAL SHUFFLE + shard assignment — the last step of
    every training-data pipeline: break source-order correlation (a model
    must not see a whole crawl domain consecutively) and write N shards a
    data loader can stream. ``df.orderBy(rand())`` is neither reproducible
    nor oracle-able; instead the shuffle key is a salted hash of the STABLE
    DOCUMENT KEY (doc_id), so the permutation is a pure function of the
    assigned ids — stable across runs, engines, partitionings, and retries
    (a re-run after a 100 TB job failure produces byte-identical shards,
    PROVIDED ids are stable across the re-run; pipelines whose ids are
    regenerated per ingest swap the key for ``md5(text)`` to get true
    content addressing, same plan).

    Output: (doc_id, shard, shard_pos) — shard by ``pmod(hash, N)``,
    position by rank of (hash, doc_id) within the shard.

    Scale shape: ONE hash-partitioned shuffle (the window's partitionBy
    moves each row once), then a per-shard sort; no global orderBy, no
    single-reducer total order. Shard count scales with data (~1 GB each;
    16 here), keeping every per-shard sort in-memory; the uniform hash key
    makes shards equal-sized by construction — no skew, no stragglers. The
    writer side is ``write_partitioned_parquet(out, ["shard"])`` on the
    sorted frame."""
    d = read_table(spark, sf_dir, "documents")
    h = md5_fold60(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col("doc_id").asc())
    return (
        d.select(
            "doc_id",
            F.pmod(h, F.lit(N_SHARDS)).cast("int").alias("shard"),
            h.alias("_h"),
        )
        .select("doc_id", "shard", F.row_number().over(w).cast("int").alias("shard_pos"))
    )


SHUFFLE_SHARD_ORACLE = f"""
SELECT doc_id, shard, CAST(row_number() OVER (
         PARTITION BY shard ORDER BY h, doc_id) AS INTEGER) AS shard_pos
FROM (
  SELECT doc_id,
         CAST({sql_md5_fold60("'shuf:' || CAST(doc_id AS VARCHAR)")} % {N_SHARDS} AS INTEGER) AS shard,
         {sql_md5_fold60("'shuf:' || CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
)
"""


TOKEN_BUDGET = 20_000  # per-source token budget for budgeted sampling


def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted per-source sampling — the corpus-mixing primitive
    behind 'take 30B tokens of web, 5B of code': documents are consumed in
    a DETERMINISTIC pseudo-random order (the salted content-hash order of
    ``shuffle_shard``/``sample_deterministic`` — stable across runs,
    engines, and partitionings) and kept while the source's running token
    total is below the budget; the document that CROSSES the budget is
    kept too (budgets are approximate by one document, the standard
    convention — truncating it would need doc splitting).

    Scale shape (r6): ~20 distinct sources means a plain per-source window
    would serialize each source's running sum through one task. The cumsum
    is the two-level prefix sum from ``operators.prefix``, sharded by the
    top 8 bits of the 60-bit ordering hash (``shiftright(_h, 52)`` — free,
    no stats pass, and monotone in ``_h`` so global (_h, doc_id) order is
    preserved exactly): local sums within (source, shard), tiny offset
    table broadcast back. Values are bit-identical to the single-level
    window the DuckDB oracle runs; the budget cut then discards the tail
    without materializing it downstream."""
    from pyspark_coding_challenge_spark.llm.text import shared_token_spine_for_dir
    from pyspark_coding_challenge_spark.operators.prefix import sharded_cumsum

    # token counts come from the cached 3-column token spine: the prefix
    # branches read persisted skinny rows instead of re-tokenizing the
    # corpus per branch (r6)
    spine = shared_token_spine_for_dir(spark, sf_dir)
    h = md5_fold60(F.concat(F.lit("tb:"), F.col("doc_id").cast("string")))
    base = spine.select(
        "doc_id", "source", "n_tokens", h.alias("_h"),
    ).withColumn("_shard", F.expr("CAST(shiftright(_h, 52) AS INT)"))
    return (
        sharded_cumsum(
            base,
            ["source"],
            [F.col("_h").asc(), F.col("doc_id").asc()],
            "n_tokens",
            "cum_tokens",
        )
        .filter(F.col("cum_tokens") - F.col("n_tokens") < TOKEN_BUDGET)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


TOKEN_BUDGET_SAMPLE_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         {_SQL_NTOK} AS n_tokens,
         {sql_md5_fold60("'tb:' || CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens, cum_tokens
FROM c WHERE cum_tokens - n_tokens < {TOKEN_BUDGET}
"""


LEN_BOUNDS = (32, 64, 128, 256)  # token-count bucket upper bounds
BATCH_SIZE = 32  # examples per batch within a (shard, bucket)


def batch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch planning — the padding-efficiency batcher every
    fixed-shape training loop runs: group documents of similar token length
    so a batch pads to its bucket bound instead of the corpus max
    (Fairseq/HF ``--group_by_length``). Buckets are FIXED boundaries (a
    CASE over the token count, one codegen pass — no global quantile pass,
    no driver collect); batch numbering is a per-(source, bucket)
    ``row_number`` over the stable doc_id order. Deterministic: re-runs
    produce identical batch assignments.

    Scale shape (r6): (source, len_bucket) has only ~20 x 5 distinct values,
    so a plain row_number window would serialize each group through one
    task. Numbering is the two-level prefix sum from ``operators.prefix``
    (row_number == cumsum of 1 under the unique doc_id order): range shard
    on doc_id (monotone — order preserved exactly), local numbering within
    (source, bucket, shard), broadcast offset add. Values are bit-identical
    to the single-level window the DuckDB oracle runs."""
    from pyspark_coding_challenge_spark.llm.text import shared_token_spine_for_dir
    from pyspark_coding_challenge_spark.operators.prefix import (
        sharded_row_number,
        with_range_shard,
    )

    spine = shared_token_spine_for_dir(spark, sf_dir)
    n = F.col("n_tokens")
    bucket = (
        F.when(n <= LEN_BOUNDS[0], 0)
        .when(n <= LEN_BOUNDS[1], 1)
        .when(n <= LEN_BOUNDS[2], 2)
        .when(n <= LEN_BOUNDS[3], 3)
        .otherwise(4)
        .cast("int")
    )
    base = with_range_shard(
        spine.select(
            "doc_id", "source", "n_tokens", bucket.alias("len_bucket")
        ),
        "doc_id",
        # same breaks as text.text_pack_sequences (doc_id quantiles of the
        # same spine) — deliberately the same cache_key, one quantile job
        cache_key=("spine_doc_id", sf_dir),
    )
    return (
        sharded_row_number(base, ["source", "len_bucket"], ["doc_id"], "_rn")
        .select(
            "doc_id", "source", "n_tokens", "len_bucket",
            F.expr(f"CAST((_rn - 1) div {BATCH_SIZE} AS BIGINT)").alias("batch_seq"),
            F.expr(f"CAST((_rn - 1) % {BATCH_SIZE} AS INTEGER)").alias("batch_pos"),
        )
    )


BATCH_PLAN_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         {_SQL_NTOK} AS n_tokens
  FROM documents
), b AS (
  SELECT *, CAST(CASE WHEN n_tokens <= {LEN_BOUNDS[0]} THEN 0
                      WHEN n_tokens <= {LEN_BOUNDS[1]} THEN 1
                      WHEN n_tokens <= {LEN_BOUNDS[2]} THEN 2
                      WHEN n_tokens <= {LEN_BOUNDS[3]} THEN 3
                      ELSE 4 END AS INTEGER) AS len_bucket
  FROM t
)
SELECT doc_id, source, n_tokens, len_bucket,
       CAST((row_number() OVER (PARTITION BY source, len_bucket
                                ORDER BY doc_id) - 1) // {BATCH_SIZE}
            AS BIGINT) AS batch_seq,
       CAST((row_number() OVER (PARTITION BY source, len_bucket
                                ORDER BY doc_id) - 1) % {BATCH_SIZE}
            AS INTEGER) AS batch_pos
FROM b
"""


def integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential/constraint audit — the pre-flight a 100 TB
    ingest runs before joining anything: orphan foreign keys (anti-joins on
    the join keys the pipeline is about to use), domain violations, and
    key-uniqueness drift, as one (metric, value) ledger.

    Scale shape: each metric is one scan + one aggregate; the two anti-joins
    shuffle on their join key (the planner broadcasts the build side when it
    is small enough — no hand-pinned hints, since 'dimension' tables are
    themselves huge at 100 TB). Nothing collects; the ledger is O(metrics)
    rows."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    li = read_table(spark, sf_dir, "lineitem")
    d = read_table(spark, sf_dir, "documents")

    def metric(name: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(name).alias("metric"),
                         F.col("value").cast("bigint").alias("value"))

    parts = [
        # No broadcast hint: customer is 10^8 rows at real scale; below the
        # auto-broadcast threshold the planner broadcasts it anyway, above
        # it the anti-join shuffles on the key — both correct, neither
        # pinned wrong forever.
        metric("orders_orphan_custkey",
               o.join(c, o.o_custkey == c.c_custkey, "left_anti")
               .agg(F.count("*").alias("value"))),
        metric("lineitem_orphan_orderkey",
               li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
               .agg(F.count("*").alias("value"))),
        metric("lineitem_discount_out_of_range",
               li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1))
               .agg(F.count("*").alias("value"))),
        metric("customer_dup_custkey",
               c.agg((F.count("*") - F.countDistinct("c_custkey"))
                     .alias("value"))),
        metric("documents_empty_text",
               d.filter(F.col("text").isNull() | (F.col("text") == ""))
               .agg(F.count("*").alias("value"))),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


INTEGRITY_AUDIT_ORACLE = """
SELECT 'orders_orphan_custkey' AS metric, CAST(count(*) AS BIGINT) AS value
FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
UNION ALL
SELECT 'lineitem_orphan_orderkey', CAST(count(*) AS BIGINT)
FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
UNION ALL
SELECT 'lineitem_discount_out_of_range', CAST(count(*) AS BIGINT)
FROM lineitem WHERE l_discount < 0 OR l_discount > 1
UNION ALL
SELECT 'customer_dup_custkey',
       CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
FROM customer
UNION ALL
SELECT 'documents_empty_text', CAST(count(*) AS BIGINT)
FROM documents WHERE text IS NULL OR text = ''
"""


def register_all(register) -> None:
    from pyspark_coding_challenge_spark.plans.merge import register_merged

    # Profiling + reproducible sampling + mixture + global shuffle ride ONE
    # slug so the registry stays inside the driver's 50-slug correctness
    # window while `dedup_clusters` gets its own slot (plans/merge.py
    # explains the cap).
    register_merged(register, "data_profile", [
        ("profile", data_profile, DATA_PROFILE_ORACLE),
        ("sample", sample_deterministic, SAMPLE_DETERMINISTIC_ORACLE),
        ("mixture", mixture_sample, MIXTURE_SAMPLE_ORACLE),
        ("shuffle_shard", shuffle_shard, SHUFFLE_SHARD_ORACLE),
        ("batch_plan", batch_plan, BATCH_PLAN_ORACLE),
        ("integrity_audit", integrity_audit, INTEGRITY_AUDIT_ORACLE),
        ("token_budget", token_budget_sample, TOKEN_BUDGET_SAMPLE_ORACLE),
    ])
