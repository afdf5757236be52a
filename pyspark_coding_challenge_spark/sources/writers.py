"""Sinks.

The reference documents (but never implements) its sink: "parquet with snappy
... partitioned by dt" (``pyspark-coding-challenge/README.md:38,65``). We
implement it. Partitioning by the day column gives dynamic partition pruning
on downstream reads; at 100 TB the per-day directories keep reprocessing
incremental.
"""

from __future__ import annotations

import os

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

    ``dst_path`` must differ from ``src_path``: overwrite mode DELETES the
    destination before the lazy read of the source completes, so in-place
    compaction would destroy the data it is compacting (r5 advisory) —
    compact to a sibling dir and rename.
    """
    if os.path.abspath(dst_path) == os.path.abspath(src_path):
        raise ValueError(
            "compact_parquet: dst_path must differ from src_path — "
            "mode('overwrite') deletes the destination before the source "
            "is fully read; compact to a temp dir and rename instead"
        )
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


def morton_code(x_col, y_col, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative integer columns —
    pure Catalyst bit arithmetic (shift/and/or folded over ``bits`` bit
    positions, one codegen expression; no UDF).

    Used by ``write_zordered_parquet``: sorting on the interleaved code
    clusters rows so that every contiguous range of the sort order covers a
    SMALL RECTANGLE in (x, y) space — the property that makes parquet
    row-group min/max statistics prune on BOTH columns at once, where a
    plain sort on x leaves y's per-file ranges as wide as the table."""
    from pyspark.sql import functions as F

    x = F.col(x_col).cast("bigint") if isinstance(x_col, str) else x_col.cast("bigint")
    y = F.col(y_col).cast("bigint") if isinstance(y_col, str) else y_col.cast("bigint")
    code = F.lit(0).cast("bigint")
    for i in range(bits):
        xbit = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y, i).bitwiseAND(F.lit(1))
        code = code.bitwiseOR(F.shiftleft(xbit, 2 * i)).bitwiseOR(
            F.shiftleft(ybit, 2 * i + 1)
        )
    return code


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_files: int = 8,
    bits: int = 8,
    compression: str = "snappy",
) -> None:
    """Z-order-clustered parquet layout — the multi-dimensional data-skipping
    write (Delta OPTIMIZE ZORDER / Iceberg sort-order analog, expressed
    with stock Spark): min-max-scale both clustering columns to the same
    ``bits``-wide integer domain, range-partition on their Morton
    interleave, sort within partitions, write one file per range.

    The scaling step is LOAD-BEARING: raw interleaving of columns with
    unequal magnitudes puts only the wide column's bits in the high Morton
    positions, so range splits degenerate to a single-column sort (measured
    — this is also why Delta's ZORDER ranks each column before
    interleaving). The min/max pass is one 1-row aggregate broadcast back
    over the rows.

    Why it matters at 100 TB: a predicate selective in EITHER column prunes
    row groups via footer min/max stats; under a single-column sort the
    second column's per-group range spans the whole domain (zero pruning),
    while Z-ordered row groups are bounded on both axes — verified by
    ``tests/test_sinks_and_edges.py`` counting qualifying row groups from
    the real footer statistics. One extra scan for the stats + one
    range-exchange + local sort; no UDF."""
    from pyspark.sql import functions as F

    x, y = cols
    top = (1 << bits) - 1
    stats = df.agg(
        F.min(x).alias("_minx"), F.max(x).alias("_maxx"),
        F.min(y).alias("_miny"), F.max(y).alias("_maxy"),
    )

    # Scale to [0, top] in DOUBLE, dividing by the range BEFORE multiplying
    # by top: the old bigint (x - min) * top overflowed int64 whenever the
    # key range exceeded ~Long.MAX/top — a snowflake-id column (range
    # ~1e18) ABORTED the write under Spark 4's default ANSI mode (r6
    # review finding, execution-confirmed). Double rounding only blurs
    # which of two adjacent cells a boundary row lands in — irrelevant to
    # clustering quality; least(top, ...) pins the max row exactly.
    def _scaled(col: str, lo: str, hi: str):
        frac = (
            (F.col(col).cast("double") - F.col(lo).cast("double"))
            / F.greatest(
                F.lit(1.0), (F.col(hi).cast("double") - F.col(lo).cast("double"))
            )
        )
        return F.least(F.lit(top).cast("bigint"), (frac * top).cast("bigint"))

    scaled_x = _scaled(x, "_minx", "_maxx")
    scaled_y = _scaled(y, "_miny", "_maxy")
    z = morton_code(scaled_x, scaled_y, bits=bits)
    (
        df.crossJoin(F.broadcast(stats))
        .withColumn("_zorder", z)
        .repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder", "_minx", "_maxx", "_miny", "_maxy")
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(path)
    )
