"""Sources: parquet (primary), JSON, CSV, in-memory.

Reference parity: the reference's tests build inputs with
``spark.createDataFrame`` (``pyspark-coding-challenge/tests/test_pipeline.py:
64-94``) and its README mandates dt-partitioned snappy parquet storage
(``README.md:38,65``). We expose ``spark.read.parquet`` over the driver's
testdata plus schema-enforced JSON/CSV readers. Columnar parquet scans give
Catalyst predicate pushdown + column pruning for free — every query in this
engine selects columns explicitly so ``ReadSchema`` stays minimal.
"""

from __future__ import annotations

import os
import threading
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Timestamp columns whose physical parquet type has varied across testdata
# generations: TIMESTAMP(NANOS) (reads as BIGINT under the nanosAsLong conf)
# or TIMESTAMP(MICROS, isAdjustedToUTC=false) (reads as TIMESTAMP_NTZ).
# Both are canonicalized to a session-tz TIMESTAMP so downstream operators
# (`unix_micros`, watermarks, date math) see one type.
_EVENT_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def canonicalize_ts(df: DataFrame, *cols: str) -> DataFrame:
    """Normalize a timestamp column to TIMESTAMP (LTZ) regardless of how the
    parquet physical type resolved:

    - BIGINT nanos (legacy TIMESTAMP(NANOS) + nanosAsLong conf): FLOOR to
      micros in pure integer arithmetic — not float division (ns epoch
      values ~1.7e18 exceed double's 53-bit mantissa), and not bare `div`
      (which truncates toward zero, so pre-1970 values like -1999 ns would
      give -1 us where flooring — and DuckDB's CAST — gives -2 us; r6
      review finding). ``(ns - pmod(ns, 1000)) div 1000`` is exact floor
      for any sign.
    - TIMESTAMP_NTZ (micros, tz-naive): cast to TIMESTAMP; with the UTC
      session timezone this is a pure re-tag of the same micros value, and
      matches DuckDB's naive civil-time interpretation.
    """
    if not cols:
        # no-op fast path: df.dtypes below forces schema analysis (~10 ms
        # of driver time) and most tables declare no ts columns (r16)
        return df
    types = dict(df.dtypes)
    for c in cols:
        dt = types.get(c)
        if dt == "bigint":
            df = df.withColumn(
                c, F.expr(f"timestamp_micros(({c} - pmod({c}, 1000)) div 1000)")
            )
        elif dt == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def ensure_event_ts_confs(spark: SparkSession) -> None:
    """Runtime-settable SQL confs the events timestamp handling needs —
    required even on sessions we didn't build (the driver passes its own
    SparkSession into entry()). Shared by the batch reader and the
    streaming source so ts canonicalization policy lives in ONE place:

    * ``nanosAsLong``: legacy TIMESTAMP(NANOS) parquet surfaces as BIGINT
      for ``canonicalize_ts`` to floor to micros.
    * UTC session time: the parquet timestamps are tz-naive
      (isAdjustedToUTC=false); UTC makes Spark's to_date/date_trunc agree
      with DuckDB's naive civil-time interpretation regardless of host
      timezone.

    CALLER-FACING SIDE EFFECT (r10 review): these are SESSION-wide confs,
    set permanently on whatever session is passed in — a later execution
    of an unrelated tz-dependent plan built earlier on a non-UTC session
    evaluates under UTC from this point on (Spark reads confs at
    execution, not plan build). This engine's contract is UTC-session
    semantics everywhere (every oracle and operator assumes it); a host
    application embedding these readers in a mixed-timezone session
    should use a separate SparkSession (`spark.newSession()`) for its own
    tz-sensitive work rather than sharing this one."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# (applicationId, path, mtime_ns, size) -> inferred StructType. r16
# optimization round (guide §1 "measure first" finding): RuleExecutor
# metrics showed ResolveDataSource at 2.38 s of tpch_composites' 2.92 s
# total rule time per WARM run — every `spark.read.parquet(path)` re-reads
# the parquet footer to re-infer a schema that cannot have changed. This
# caches METADATA only (the exact role a catalog/metastore table plays in
# a deployment — data is still scanned from parquet on every execution);
# the mtime+size key self-invalidates when a test rewrites a path in
# place, so no explicit clear hook is needed.
_TABLE_SCHEMA_CACHE: dict[tuple[str, str, int, int], object] = {}
_TABLE_SCHEMA_LOCK = threading.Lock()
# (applicationId, DataFrame.semanticHash()) -> scan split count, for
# rebalance_for_compute's probe. Perf-only memo: a stale entry can at
# worst mis-size ONE repartition (results are partition-independent by
# the repo's determinism rules); it never affects row values. STALENESS
# ACCEPTED (r16 advisory): the split count depends on file sizes, and a
# same-schema in-place rewrite keeps the same canonical plan — the memo
# then serves the old count until the process ends. read_table-derived
# frames dodge this in practice: a rewrite changes (mtime, size), so
# read_table hands out a NEW DataFrame object and the object-attribute
# fast path below misses, while this fallback only mis-sizes the
# repartition width, never a row value.
_SPLIT_COUNT_CACHE: dict[tuple[str, int], int] = {}
# Object-identity fast path: the probed split count is stored ON the
# DataFrame wrapper itself (df.__dict__[_SPLIT_ATTR]) instead of a
# module-level id(df) map — the r16 map held strong DataFrame refs with
# no size bound or clear hook, pinning stopped sessions' plan objects
# for the process lifetime (r16 advisory). An attribute dies with the
# object, costs O(0) bookkeeping, and cannot go stale across rewrites
# (new file state -> new object from read_table).
_SPLIT_ATTR = "_spark_graft_split_count"


def _read_parquet_cached_schema(spark: SparkSession, path: str) -> DataFrame:
    """`spark.read.parquet` with the inferred schema memoized per
    (session, file identity) and re-supplied explicitly — skips the
    footer-read/schema-merge work inside Catalyst's ResolveDataSource on
    every subsequent read of the same file. Falls back to plain inference
    for non-stat-able paths (globs, remote URIs)."""
    try:
        st = os.stat(path)
        key = (spark.sparkContext.applicationId, path,
               st.st_mtime_ns, st.st_size)
    except OSError:
        return spark.read.parquet(path)
    with _TABLE_SCHEMA_LOCK:
        schema = _TABLE_SCHEMA_CACHE.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        with _TABLE_SCHEMA_LOCK:
            _TABLE_SCHEMA_CACHE[key] = schema
    return spark.read.schema(schema).parquet(path)


# SparkSession -> {(path, mtime_ns, size) -> canonicalized DataFrame}.
# DataFrames are immutable lazy plans, so handing every caller the same
# object is semantically identical to rebuilding it — Spark itself
# resolves repeated/self-joined uses via DeduplicateRelations exactly as
# it does for `spark.table`'s shared relation cache. Keyed by the SESSION
# OBJECT (not applicationId): a DataFrame is bound to the session that
# built it, and `spark.newSession()` shares one applicationId (the
# streaming conf-pin lesson, r11). Keeping ~10 ms of reader construction
# out of each of the ~hundreds of read_table calls a bench run makes.
# WeakKeyDictionary on the session (r16 advisory): a stopped/collected
# session drops its whole table map, so pytest-style many-session
# processes no longer accumulate dead JVM plan handles; and installing a
# fresh (mtime, size) entry evicts the same path's stale predecessors.
_TABLE_DF_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = \
    weakref.WeakKeyDictionary()


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table (TESTDATA.md) as a DataFrame."""
    if name in _EVENT_TS_COLS:
        ensure_event_ts_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        key = None
    if key is not None:
        with _TABLE_SCHEMA_LOCK:
            df = _TABLE_DF_CACHE.get(spark, {}).get(key)
        if df is not None:
            return df
    df = canonicalize_ts(
        _read_parquet_cached_schema(spark, path),
        *_EVENT_TS_COLS.get(name, ()),
    )
    if key is not None:
        with _TABLE_SCHEMA_LOCK:
            per_session = _TABLE_DF_CACHE.setdefault(spark, {})
            # evict the same path's stale (older mtime/size) entries so a
            # rewrite loop cannot grow the map without bound
            for k in [k for k in per_session if k[0] == path and k != key]:
                del per_session[k]
            per_session[key] = df
    return df


def read_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(read_table(spark, sf_dir, n) for n in names)


def rebalance_for_compute(df: DataFrame, *key_cols: str) -> DataFrame:
    """Spread a narrow input across the cluster before a CPU-bound per-row
    kernel (shingling, hashing, vector math).

    Scan parallelism equals the number of file splits, and a parquet file is
    splittable only at row-group boundaries — so a small or single-row-group
    input runs every downstream narrow transformation on a handful of cores
    no matter how wide the cluster is. When that happens, one cheap shuffle
    of the raw rows buys full parallelism for the expensive kernel.

    No-op when the scan already yields >= defaultParallelism splits (the
    normal case at scale, where many files/row groups parallelize the scan
    natively) — so this never adds a shuffle to a 100 TB input that is
    already wide.

    The split-count probe (``df.rdd.getNumPartitions``) forces eager
    physical planning and is unavailable on Spark Connect sessions — in
    that case fall through to an unconditional repartition sized by
    ``spark.sql.shuffle.partitions`` (r10 review finding: the old
    hard-coded 32 could COLLAPSE an arbitrarily wide input, and AQE never
    overrides an explicit numPartitions — it only right-sizes shuffles
    with an unspecified count; the conf is the knob a Connect deployment
    actually sizes to its cluster).
    """
    try:
        target = df.sparkSession.sparkContext.defaultParallelism
        # r16 optimization round: the probe itself costs ~55 ms of DRIVER
        # time per call (physical planning + RDD DAG build) and hot query
        # paths construct the same scan dozens of times per bench run —
        # memoize the verdict per (session, canonicalized plan). Two
        # semantically-equal inputs split identically by construction, so
        # the cached count is exact, and a rewritten file behind the same
        # path flows through read_table's mtime-keyed schema cache into a
        # DIFFERENT canonical plan only when its schema changed — so the
        # count is also refreshed whenever the split-relevant inputs
        # (plan shape) change; the split rule itself depends only on conf
        # values that are session-stable here.
        # object-attribute fast path first: read_table returns one cached
        # DataFrame per (session, file state), so repeated rebalances of
        # the same input skip even the semanticHash JVM round-trip (~13
        # ms). Stored on the wrapper itself — lifetime tied to the object,
        # no module-level strong refs (see _SPLIT_ATTR note above).
        n = df.__dict__.get(_SPLIT_ATTR)
        if n is None:
            key = (df.sparkSession.sparkContext.applicationId,
                   df.semanticHash())
            with _TABLE_SCHEMA_LOCK:
                n = _SPLIT_COUNT_CACHE.get(key)
            if n is None:
                n = df.rdd.getNumPartitions()
                with _TABLE_SCHEMA_LOCK:
                    _SPLIT_COUNT_CACHE[key] = n
            df.__dict__[_SPLIT_ATTR] = n
        if n >= target:
            return df
    except Exception:  # Spark Connect: no sparkContext / DataFrame.rdd
        try:
            target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except Exception:  # e.g. conf value "auto" under some AQE setups
            target = 32
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)


def read_json(spark: SparkSession, path: str, ddl_schema: str) -> DataFrame:
    """Schema-enforced JSON source (no inference — SURVEY §5.2)."""
    return spark.read.schema(ddl_schema).json(path)


def read_csv(spark: SparkSession, path: str, ddl_schema: str, header: bool = True) -> DataFrame:
    return spark.read.schema(ddl_schema).csv(path, header=header)


def read_orc(spark: SparkSession, path: str, ddl_schema: str | None = None) -> DataFrame:
    """ORC source — the other columnar format Spark reads natively with the
    same pushdown/pruning machinery as parquet. Schema optional: ORC files
    are self-describing; pass ``ddl_schema`` to enforce a contract (columns
    are matched by name, extra file columns pruned)."""
    r = spark.read
    if ddl_schema is not None:
        r = r.schema(ddl_schema)
    return r.orc(path)
