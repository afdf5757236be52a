"""Sinks.

The reference documents (but never implements) its sink: "parquet with snappy
... partitioned by dt" (``pyspark-coding-challenge/README.md:38,65``). We
implement it. Partitioning by the day column gives dynamic partition pruning
on downstream reads; at 100 TB the per-day directories keep reprocessing
incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (+ optionally sorted) parquet table — the co-located-join
    layout: two tables bucketed on their join key with the same bucket
    count join WITHOUT a shuffle (the bucketed scan already satisfies the
    hash-partitioning requirement), and sortBy removes the sort from
    sort-merge joins too. This is the 100 TB answer for fact-to-fact joins
    that recur on the same key (orders x lineitem on orderkey): pay the
    shuffle once at write time, never again at read time.
    Plan-asserted in tests/test_bucketing.py.

    ``path`` makes it an external table (data at ``path``, only metadata in
    the catalog) — keeps bucketing usable without a writable warehouse dir.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def _write_partitioned(
    df: DataFrame,
    path: str,
    fmt: str,
    partition_cols: tuple[str, ...],
    mode: str,
    compression: str,
) -> None:
    (
        df.write.mode(mode)
        .option("compression", compression)
        .partitionBy(*partition_cols)
        .format(fmt)
        .save(path)
    )


def write_partitioned_orc(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("dt",),
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """ORC twin of ``write_partitioned_parquet`` — same dynamic-partition
    layout, zstd by default (ORC's best size/speed point on text-heavy
    columns). Interop path for Hive-era consumers that mandate ORC."""
    _write_partitioned(df, path, "orc", partition_cols, mode, compression)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("dt",),
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    _write_partitioned(df, path, "parquet", partition_cols, mode, compression)


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 512,
    compression: str = "snappy",
) -> int:
    """Small-files compaction — the maintenance job every long-running
    ingest needs: a streaming/incremental writer leaves thousands of
    KB-sized parquet files per partition, and at 100 TB the resulting
    driver-side file listing + per-file open cost dominates scan time long
    before the bytes do.

    Strategy: size the output file count from the ACTUAL input bytes
    (filesystem metadata via the Hadoop API — no data scan), then rewrite
    with ``coalesce(n)``. ``coalesce`` (not ``repartition``) merges
    existing partitions WITHOUT a shuffle: each output task reads several
    input files sequentially and writes one target-sized file; row order
    within files changes, row content never does. Returns the chosen file
    count.

    ``maxRecordsPerFile`` is deliberately NOT used here: it caps rows per
    file but cannot merge inputs, which is the problem being solved.

    Scale note: one pass over the data, zero shuffle, embarrassingly
    parallel in the number of output files. For partitioned layouts run
    per-partition (the src/dst paths address one partition directory), so
    compaction parallelizes across partitions and never rewrites cold ones.
    """
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = path.getFileSystem(conf)
    total_bytes = fs.getContentSummary(path).getLength()
    n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    (
        spark.read.parquet(src_path)
        .coalesce(n_files)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(dst_path)
    )
    return n_files
