"""Streaming document ingest with WRITE-TIME digests (r13).

``artifacts.update_all_incremental`` accepts caller-supplied (id, digest)
relations for the new snapshot so a refresh never hashes the corpus — the
probe measures that arm, but something has to BE the caller. This module is
that ingest: a structured-streaming pipeline whose ``foreachBatch`` sink
appends each micro-batch's document rows AND their ``(doc_id, digest,
batch_id)`` rows in the same pass, computing the md5 while the text is
already in executor memory. A downstream refresh then runs fully
churn-sized end-to-end: ingest pays the hash once at write time, the
refresh reads two thin columns.

The digest expression is ``artifacts.doc_digest_relation`` — the ONE
definition the diff, the lineage fold, and the supplied-digest gate all
share, so an ingest-provided relation can never disagree with what the
refresh would have computed (the gate's bounded spot-check re-verifies a
deterministic sample anyway; see ``artifacts._supplied_digest_gate``).

Scale shape: the sink write is executor-side and distributed (foreachBatch
hands the micro-batch to a normal distributed write — nothing lands on the
driver); the digest side adds one md5 projection over rows already being
written. At 100 TB/day the file source becomes Kafka/Delta and the sinks
Delta/Iceberg tables; the digest relation stays two thin columns per doc.

Exactly-once note (r14, closing the r13 verdict's disclosed gap): Spark's
foreachBatch is at-least-once on task retry — a redelivered batch arrives
with the SAME batch_id. Both sinks here are made idempotent by batch_id:
each micro-batch is written to a private staging directory, published
into the sink under deterministic batch-keyed file names (a retry deletes
that batch's files and republishes — overwrite, never duplicate), and
committed with an atomically-renamed marker file; a batch whose marker
exists is skipped entirely. This is the Delta ``txn`` app-id/version
recipe expressed over a directory sink: marker present => the batch's
rows are fully published exactly once; marker absent => the retry
republishes from scratch. ``ingest_digests_relation``'s (doc_id, digest)
dedupe stays as defense-in-depth for pre-r14 sinks. On an object store
without atomic rename, the marker write is the one step that needs the
store's conditional-put (or a real table format) — the batch-keyed
naming still guarantees overwrite-not-duplicate.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_coding_challenge_spark.streaming.windows import (
    _fresh_dirs,
    _stream_shuffle_partitions,
)

#: leaf names inside an ingest destination directory
DOCS_LEAF = "documents.parquet"
DIGESTS_LEAF = "ingest_digests.parquet"

_DOC_SCHEMA_CACHE: dict[tuple[str, str], object] = {}
_DOC_SCHEMA_LOCK = threading.Lock()


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming reader over ``sf_dir``'s documents table — the documents
    twin of ``windows.read_events_stream`` (footer-probed schema, cached
    per (session, dir); glob keeps the stream off the sibling tables when
    the dataset is the driver's single-file shape)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    with _DOC_SCHEMA_LOCK:
        schema = _DOC_SCHEMA_CACHE.get(key)
        if schema is None:
            schema = spark.read.parquet(f"{sf_dir}/{DOCS_LEAF}").schema
            _DOC_SCHEMA_CACHE[key] = schema
    path = f"{sf_dir}/{DOCS_LEAF}"
    if os.path.isdir(path):
        return spark.readStream.schema(schema).parquet(path)
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", DOCS_LEAF)
        .parquet(sf_dir)
    )


def clear_doc_schema_cache(spark: SparkSession | None = None) -> int:
    """Staleness valve, mirroring ``windows.clear_stream_schema_cache``."""
    released = 0
    app = spark.sparkContext.applicationId if spark is not None else None
    with _DOC_SCHEMA_LOCK:
        for key in list(_DOC_SCHEMA_CACHE):
            if app is None or key[0] == app:
                del _DOC_SCHEMA_CACHE[key]
                released += 1
    return released


def _publish_batch_files(staging: str, sink: str, prefix: str) -> None:
    """Move a staged batch's parquet part files into ``sink`` under
    deterministic batch-keyed names (``<prefix>-00000.parquet``, ...).
    Idempotent by construction: any files a previous (crashed or
    redelivered) attempt published under this prefix are deleted first,
    so a retry OVERWRITES the batch's contribution rather than appending
    a second copy — even when the retry's computation shuffled the rows
    into a different part-file split."""
    os.makedirs(sink, exist_ok=True)
    for stale in _glob.glob(os.path.join(sink, f"{prefix}-*.parquet")):
        os.remove(stale)
    parts = sorted(
        f for f in os.listdir(staging)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    for i, part in enumerate(parts):
        os.replace(os.path.join(staging, part),
                   os.path.join(sink, f"{prefix}-{i:05d}.parquet"))


def commit_ingest_batch(batch: DataFrame, batch_id: int,
                        dest_dir: str) -> int:
    """Idempotently land one micro-batch into both sinks (module-level so
    the redelivery test can drive it directly, outside a stream):

    1. skip outright when the batch's commit marker exists (a fully
       committed batch redelivered by an at-least-once source);
    2. write document rows and their write-time ``(doc_id, digest,
       batch_id)`` rows to a private staging dir — ONE pass over the
       batch (persist, two writes, count, unpersist);
    3. publish the staged part files into each sink under deterministic
       ``b<batch_id>-*`` names (retry deletes-then-moves: overwrite,
       never duplicate);
    4. commit by atomically renaming the marker into place.

    A crash between 3 and 4 leaves published files with no marker; the
    retry republishes the identical batch over them and then commits —
    the sink never holds two copies of a row. Returns the batch's row
    count (0 for a skipped redelivery)."""
    from pyspark_coding_challenge_spark.llm.artifacts import doc_digest_relation

    marker = os.path.join(dest_dir, f"_batch_{batch_id}.committed")
    if os.path.exists(marker):
        return 0
    staging = os.path.join(dest_dir, f"_staging_batch_{batch_id}")
    shutil.rmtree(staging, ignore_errors=True)
    batch = batch.persist()
    try:
        batch.write.mode("overwrite").parquet(os.path.join(staging, "docs"))
        doc_digest_relation(batch).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("overwrite").parquet(os.path.join(staging, "dig"))
        n = batch.count()
    finally:
        batch.unpersist()
    prefix = f"b{batch_id}"
    _publish_batch_files(os.path.join(staging, "docs"),
                         os.path.join(dest_dir, DOCS_LEAF), prefix)
    _publish_batch_files(os.path.join(staging, "dig"),
                         os.path.join(dest_dir, DIGESTS_LEAF), prefix)
    tmp_marker = marker + ".tmp"
    with open(tmp_marker, "w") as f:
        f.write(str(n))
    os.replace(tmp_marker, marker)  # the atomic commit point
    shutil.rmtree(staging, ignore_errors=True)
    return n


def ingest_documents(spark: SparkSession, src_dir: str, dest_dir: str,
                     max_files_per_trigger: int | None = None) -> dict:
    """Drive a documents stream from ``src_dir`` into ``dest_dir``
    (availableNow), landing per micro-batch: the document rows into
    ``dest_dir/documents.parquet`` and their write-time ``(doc_id, digest,
    batch_id)`` rows into ``dest_dir/ingest_digests.parquet`` — via the
    batch_id-keyed idempotent commit (``commit_ingest_batch``), so an
    at-least-once redelivery overwrites its batch instead of duplicating
    it. Returns ``{"batches": N, "rows": M}``."""
    os.makedirs(dest_dir, exist_ok=True)
    stats = {"batches": 0, "rows": 0}

    def _write(batch: DataFrame, batch_id: int) -> None:
        stats["rows"] += commit_ingest_batch(batch, batch_id, dest_dir)
        stats["batches"] += 1

    stream = read_documents_stream(spark, src_dir)
    if max_files_per_trigger is not None:
        # re-open with the trigger bound so the test can force multi-batch
        reader = (
            spark.readStream.schema(stream.schema)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
        )
        src_leaf = os.path.join(src_dir, DOCS_LEAF)
        if os.path.isdir(src_leaf):
            stream = reader.parquet(src_leaf)
        else:
            # single-file dataset: keep the glob or the stream would also
            # ingest the sibling tables (the read_events_stream rule)
            stream = reader.option("pathGlobFilter", DOCS_LEAF).parquet(src_dir)
    _, ck = _fresh_dirs(f"ingest_{os.path.basename(dest_dir.rstrip('/'))}")
    with _stream_shuffle_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(_write)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return stats


def ingest_digests_relation(spark: SparkSession, dest_dir: str) -> DataFrame:
    """The ingested corpus's (doc_id, digest) — what a refresh passes as
    ``update_all_incremental(..., new_digests=...)``. Distinct over
    (doc_id, digest): an at-least-once redelivery appends the same rows
    twice, and the supplied-digest gate's row-count parity would reject
    the duplicated relation even though every digest is correct."""
    return (
        spark.read.parquet(os.path.join(dest_dir, DIGESTS_LEAF))
        .select("doc_id", "digest")
        .distinct()
    )


def ingest_changelog_relation(spark: SparkSession, dest_dir: str,
                              since_batch: int = 0) -> DataFrame:
    """The ingested rows as a CDC changelog — (doc_id, change='added',
    digest_new) for every row batch ``since_batch`` onward. A pure-append
    ingest knows its op code by construction; handed to
    ``update_all_incremental(new_changelog=...)`` against the
    pre-append snapshot, churn DETECTION becomes O(churn): no corpus-
    wide diff join anywhere in the refresh (the step past supplied
    digests — an upsert/delete-capable CDC source emits its real op
    codes the same shape). Dedup rule matches
    ``ingest_digests_relation``."""
    return (
        spark.read.parquet(os.path.join(dest_dir, DIGESTS_LEAF))
        .filter(F.col("batch_id") >= since_batch)
        .select("doc_id",
                F.lit("added").alias("change"),
                F.col("digest").alias("digest_new"))
        .distinct()
    )


def streaming_ingest_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``ingest_digests`` section of ``streaming_windowed_aggs``: run
    the real ingest stream over the corpus into a fresh sink, then emit
    one row per ingested document — its write-time digest and how many
    copies landed in the digest sink. The DuckDB oracle md5s the same
    corpus directly with ``copies = 1``, so the hash gate proves (a) every
    document flowed through the stream exactly once and (b) the write-time
    digest equals the batch-side definition the refresh chain trusts."""
    sink, _ = _fresh_dirs("ingest_digests_dest")
    ingest_documents(spark, sf_dir, sink)
    dig = spark.read.parquet(os.path.join(sink, DIGESTS_LEAF))
    return (
        dig.groupBy("doc_id", "digest")
        .agg(F.count("*").cast("int").alias("copies"))
    )


STREAMING_INGEST_DIGESTS_ORACLE = """
SELECT doc_id, md5(COALESCE(text, '')) AS digest, CAST(1 AS INTEGER) AS copies
FROM documents
"""
