"""Structured Streaming layer over ``events`` (SURVEY §7 Phase 4).

Each registered slug runs a REAL streaming query: parquet file source ->
watermarked stateful transformation -> memory sink, driven to completion
with an ``availableNow`` trigger, then returned as the sink table. With all
data in place the results are batch-equivalent — which is exactly what makes
them DuckDB-oracle-checkable (SURVEY §5.3-2). Watermark *eviction* semantics
(late rows dropped across micro-batch boundaries) can't be seen in a single
availableNow pass over one file; they are pinned by the multi-batch test in
tests/test_streaming.py.

The reference is batch-only (SURVEY §2.11) — this layer is an extension
mandated by the north star, built on the streaming-native versions of the
same operators: tumbling/sliding/session windows + stateful dedup.

Scale notes: state is keyed by (window, key) and bounded by the watermark;
shuffle partitioning is the normal groupBy hash. At 100 TB/day the file
source becomes Kafka/Delta, everything else is unchanged.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# events.parquet stores ts as TIMESTAMP(NANOS); with the nanosAsLong conf the
# file-source schema sees a BIGINT (see sources/readers.py for the batch
# twin of this handling).
_EVENTS_RAW_DDL = (
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = (
        spark.readStream.schema(_EVENTS_RAW_DDL)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def run_to_table(stream: DataFrame, spark: SparkSession, mode: str = "append") -> DataFrame:
    """Drive a streaming DataFrame to completion (availableNow) into a
    memory sink; return the materialized result table."""
    name = f"stream_{uuid.uuid4().hex[:12]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event_type with a 1-hour watermark."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .count()
    )
    out = run_to_table(agg, spark, mode="complete")
    return out.select(
        F.col("w.start").cast("string").alias("window_start"),
        "event_type",
        F.col("count").alias("cnt"),
    )


STREAMING_TUMBLING_COUNTS_ORACLE = """
SELECT CAST(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS VARCHAR) AS window_start,
       event_type, count(*) AS cnt
FROM events GROUP BY 1, 2
"""


def streaming_sliding_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes; value summed in exact
    integer milli-units (per-row double->int is deterministic; integer sums
    are order-independent, so streaming partial aggregation can't diverge
    from the oracle)."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withColumn("value_milli", F.round(F.col("value") * 1000).cast("bigint"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.sum("value_milli").alias("sum_milli"), F.count("*").alias("cnt"))
    )
    out = run_to_table(agg, spark, mode="complete")
    return out.select(
        F.col("w.start").cast("string").alias("window_start"),
        "sum_milli",
        "cnt",
    )


# A 1h-window/30m-slide assigns each event to 2 windows: the half-hour
# bucket it lands in and the previous one.
STREAMING_SLIDING_SUM_ORACLE = """
WITH b AS (
  SELECT time_bucket(INTERVAL 30 MINUTES, CAST(ts AS TIMESTAMP)) AS halfhour,
         CAST(ROUND(value * 1000) AS BIGINT) AS value_milli
  FROM events
),
assigned AS (
  SELECT halfhour AS window_start, value_milli FROM b
  UNION ALL
  SELECT halfhour - INTERVAL 30 MINUTES, value_milli FROM b
)
SELECT CAST(window_start AS VARCHAR) AS window_start,
       CAST(sum(value_milli) AS BIGINT) AS sum_milli,
       count(*) AS cnt
FROM assigned GROUP BY 1
"""


def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap — the
    dynamic-window stateful operator. Oracle is the classic gaps-and-islands
    rewrite in SQL."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("cnt"), F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias("sum_milli"))
    )
    out = run_to_table(agg, spark, mode="complete")
    return out.select(
        "user_id",
        F.col("w.start").cast("string").alias("session_start"),
        "cnt",
        "sum_milli",
    )


STREAMING_SESSION_WINDOWS_ORACLE = """
WITH ordered AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
         CAST(ROUND(value * 1000) AS BIGINT) AS value_milli,
         CASE WHEN CAST(ts AS TIMESTAMP)
                   - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTES
              OR lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, value_milli,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ordered
)
SELECT user_id, CAST(min(ts) AS VARCHAR) AS session_start,
       count(*) AS cnt, CAST(sum(value_milli) AS BIGINT) AS sum_milli
FROM sessions GROUP BY user_id, session_id
"""


def streaming_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates on (user_id, event_type): state holds one
    entry per key, bounded by the watermark. The SET of surviving keys is
    deterministic (which row arrives first per key is not, so only keys are
    emitted)."""
    ev = read_events_stream(spark, sf_dir)
    dedup = (
        ev.withWatermark("ts", "1 hour")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_to_table(dedup, spark)


STREAMING_STATEFUL_DEDUP_ORACLE = """
SELECT DISTINCT user_id, event_type FROM events
"""


def _counter_fn(key, pdf_iter, state):
    """applyInPandasWithState kernel: running per-user event count + exact
    value sum in integer milli-units, carried in group state across
    micro-batches."""
    import pandas as pd

    cnt, milli = state.get if state.exists else (0, 0)
    for pdf in pdf_iter:
        cnt += len(pdf)
        milli += int(pdf["value_milli"].sum())
    state.update((cnt, milli))
    yield pd.DataFrame({"user_id": [key[0]], "cnt": [cnt], "sum_milli": [milli]})


def streaming_custom_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState — the escape
    hatch for stateful logic the built-in windows can't express (here a
    running per-user counter, chosen precisely because its final state IS
    SQL-expressible, so the driver can oracle the custom-operator plumbing).
    Update mode: each micro-batch emits one row per touched user; with one
    input file there is one data batch, so the sink holds the final totals."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = read_events_stream(spark, sf_dir).select(
        "user_id", F.round(F.col("value") * 1000).cast("bigint").alias("value_milli")
    )
    counted = ev.groupBy("user_id").applyInPandasWithState(
        _counter_fn,
        outputStructType="user_id BIGINT, cnt BIGINT, sum_milli BIGINT",
        stateStructType="cnt BIGINT, sum_milli BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_table(counted, spark, mode="update")


STREAMING_CUSTOM_STATEFUL_ORACLE = """
SELECT user_id, count(*) AS cnt,
       CAST(sum(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT) AS sum_milli
FROM events GROUP BY user_id
"""


def streaming_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joins the static
    ``customer`` dimension (re-read per micro-batch, so dimension updates
    between batches are picked up), then windowed counts per customer
    nation. The static side needs no watermark and keeps no state; Spark
    broadcasts it when small — the canonical fact-stream x dim-table shape
    at any scale."""
    from pyspark_coding_challenge_spark.sources.readers import read_table

    ev = read_events_stream(spark, sf_dir)
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    agg = (
        ev.withWatermark("ts", "1 hour")
        .join(cust, on="user_id")  # stream-static inner join
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_nationkey")
        .count()
    )
    out = run_to_table(agg, spark, mode="complete")
    return out.select(
        F.col("w.start").cast("string").alias("window_start"),
        F.col("c_nationkey").alias("nation"),
        F.col("count").alias("cnt"),
    )


STREAMING_STREAM_STATIC_JOIN_ORACLE = """
SELECT CAST(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS VARCHAR) AS window_start,
       c_nationkey AS nation, count(*) AS cnt
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
"""


def register_all(register) -> None:
    register("streaming_tumbling_counts", streaming_tumbling_counts, STREAMING_TUMBLING_COUNTS_ORACLE)
    register("streaming_sliding_sum", streaming_sliding_sum, STREAMING_SLIDING_SUM_ORACLE)
    register("streaming_session_windows", streaming_session_windows, STREAMING_SESSION_WINDOWS_ORACLE)
    register("streaming_stateful_dedup", streaming_stateful_dedup, STREAMING_STATEFUL_DEDUP_ORACLE)
    register("streaming_custom_stateful", streaming_custom_stateful, STREAMING_CUSTOM_STATEFUL_ORACLE)
    register("streaming_stream_static_join", streaming_stream_static_join,
             STREAMING_STREAM_STATIC_JOIN_ORACLE)
