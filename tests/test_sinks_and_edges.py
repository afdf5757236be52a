"""Sink round-trip, persist-hint reuse, and the non-canonical-dt regression
(VERDICT r1: "What's wrong" #2, "What's missing" #6/#9)."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark_coding_challenge_spark import schemas
from pyspark_coding_challenge_spark.plans.training import produce_training_examples
from pyspark_coding_challenge_spark.sources.writers import write_partitioned_parquet


def ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


@pytest.fixture()
def small_inputs(spark):
    impressions = spark.createDataFrame(
        [
            ("2025-08-14", "r1", 1, [(100, False), (200, True)]),
            ("2025-08-15", "r2", 1, [(300, False)]),
        ],
        schema=schemas.IMPRESSIONS_DDL,
    )
    clicks = spark.createDataFrame(
        [("2025-08-13", 1, 10, ts("2025-08-13 12:00:00"))],
        schema=schemas.CLICKS_DDL,
    )
    carts = spark.createDataFrame([], schema=schemas.ADD_TO_CARTS_DDL)
    orders = spark.createDataFrame([], schema=schemas.ORDERS_ACTIONS_DDL)
    return impressions, clicks, carts, orders


def test_sink_parquet_partitioned_roundtrip(spark, small_inputs, tmp_path):
    """README.md:38,65 mandates dt-partitioned snappy parquet output."""
    out = produce_training_examples(*small_inputs, max_history=3)
    path = str(tmp_path / "train_out")
    write_partitioned_parquet(out, path)

    back = spark.read.parquet(path)
    assert back.count() == 3
    # dt survives as a readable partition column (Spark type-infers partition
    # values, so compare through a string cast).
    assert sorted(
        r.dt for r in back.selectExpr("cast(dt as string) dt").distinct().collect()
    ) == ["2025-08-14", "2025-08-15"]
    # partition pruning: reading one day touches only that directory
    one_day = spark.read.parquet(path).filter("dt = '2025-08-15'")
    assert one_day.count() == 1


def test_persist_hint_same_results(spark, small_inputs):
    """persist_actions persists the normalized action table (README.md:64);
    results must be identical with and without."""
    plain = produce_training_examples(*small_inputs, max_history=3).collect()
    persisted = produce_training_examples(
        *small_inputs, max_history=3, persist_actions=True
    ).collect()
    key = lambda r: (r.dt, r.customer_id, r.impression_pos)
    assert sorted(map(tuple, plain), key=repr) == sorted(map(tuple, persisted), key=repr)


def test_sessionize_gap_semantics_on_crafted_events(spark, tmp_path):
    """Gap strictly-greater-than-30min starts a new session; an exactly
    30-minute gap does NOT (the boundary the oracle equality can't pin if
    both engines drifted the same way)."""
    import datetime as dt

    from pyspark_coding_challenge_spark.plans.relational import window_sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: 0min, +30min (same session), +30min+1s (new session)
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=30), 1, "view", 2.0, "{}"),
        (3, t0 + dt.timedelta(minutes=60, seconds=1), 1, "view", 4.0, "{}"),
        # user 2: single event
        (4, t0, 2, "click", 8.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, schema="event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                     "event_type STRING, value DOUBLE, props STRING")
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {(r.user_id, r.session_seq): r
           for r in window_sessionize(spark, str(tmp_path)).collect()}
    assert set(got) == {(1, 1), (1, 2), (2, 1)}
    assert got[(1, 1)].n_events == 2 and got[(1, 1)].value_cents == 300
    assert got[(1, 1)].duration_us == 30 * 60 * 1_000_000
    assert got[(1, 2)].n_events == 1 and got[(1, 2)].value_cents == 400
    assert got[(2, 1)].n_events == 1 and got[(2, 1)].duration_us == 0


@pytest.mark.parametrize("seed", [7, 23])
def test_sessionize_matches_python_model_on_random_events(spark, tmp_path, seed):
    """Model-based check: for random per-user event sequences with gaps
    crafted to straddle the 30-minute boundary (0 s, 1799 s, 1800 s,
    1801 s, 2 h), sessionization must agree with a pure-Python reference
    on session count, membership, spans, and cent totals."""
    import random
    from datetime import datetime, timedelta, timezone

    from pyspark_coding_challenge_spark.plans.relational import (
        SESSION_GAP_US,
        window_sessionize,
    )

    def _us(ts):  # naive-as-UTC micros; .timestamp() alone would use host tz
        return int(ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)

    rng = random.Random(seed)
    base = datetime(2024, 5, 1)
    rows, eid = [], 0
    for user in range(1, 41):
        t = base + timedelta(seconds=rng.randint(0, 3600))
        for _ in range(rng.randint(1, 12)):
            eid += 1
            rows.append((eid, t, user, "e", rng.randint(0, 10000) / 100.0, "{}"))
            t += timedelta(seconds=rng.choice([0, 1, 300, 1799, 1800, 1801, 7200]))
    df = spark.createDataFrame(
        rows, schema="event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                     "event_type STRING, value DOUBLE, props STRING")
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    # pure-Python model (micros integers, same strict-> boundary)
    model = {}
    by_user: dict[int, list] = {}
    for e, ts, u, _, v, _p in rows:
        by_user.setdefault(u, []).append((_us(ts), e, v))
    for u, evs in by_user.items():
        evs.sort()
        seq, prev = 0, None
        for us, _e, v in evs:
            if prev is None or us - prev > SESSION_GAP_US:
                seq += 1
            prev = us
            key = (u, seq)
            st, en, n, cents = model.get(key, (us, us, 0, 0))
            model[key] = (min(st, us), max(en, us), n + 1, cents + int(round(v * 100)))

    got = {(r.user_id, r.session_seq): (r.start_us, r.end_us, r.n_events, r.value_cents)
           for r in window_sessionize(spark, str(tmp_path)).collect()}
    assert got == model


def test_non_canonical_dt_still_joins_history(spark):
    """'2025-8-14' parses to a valid cutoff; history must still attach
    (join on to_date(dt), not the raw string — VERDICT r1 wrong-#2)."""
    impressions = spark.createDataFrame(
        [("2025-8-14", "r1", 1, [(100, False)])],
        schema=schemas.IMPRESSIONS_DDL,
    )
    clicks = spark.createDataFrame(
        [("2025-08-13", 1, 10, ts("2025-08-13 12:00:00"))],
        schema=schemas.CLICKS_DDL,
    )
    carts = spark.createDataFrame([], schema=schemas.ADD_TO_CARTS_DDL)
    orders = spark.createDataFrame([], schema=schemas.ORDERS_ACTIONS_DDL)

    rows = produce_training_examples(
        impressions, clicks, carts, orders, max_history=3
    ).collect()
    assert len(rows) == 1
    # The prior-day click is present, not silently replaced by all-pad arrays.
    assert rows[0].actions == [10, 0, 0]
    assert rows[0].action_types == [1, 0, 0]


@pytest.mark.parametrize("seed", [11, 37])
def test_batch_plan_matches_python_model_on_random_docs(spark, tmp_path, seed):
    """Model-based check for length-bucketed batching: random docs with
    token counts crafted to straddle every bucket boundary (32/64/128/256,
    the empty doc, and the over-512 tail) must batch exactly like a
    pure-Python model — same bucket, same batch_seq, same batch_pos."""
    import random

    from pyspark_coding_challenge_spark.llm.profiling import (
        BATCH_SIZE,
        LEN_BOUNDS,
        batch_plan,
    )

    rng = random.Random(seed)
    boundary_counts = [1, 31, 32, 33, 63, 64, 65, 127, 128, 129,
                       255, 256, 257, 400, 600]
    rows = []
    for doc_id in range(1, 301):
        n = rng.choice(boundary_counts)
        rows.append((doc_id, " ".join(f"t{i}" for i in range(n)),
                     "en", f"src{rng.randint(0, 3)}", n))
    df = spark.createDataFrame(
        rows, schema="doc_id BIGINT, text STRING, lang STRING, "
                     "source STRING, n_chars BIGINT")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    def bucket(n: int) -> int:
        for i, b in enumerate(LEN_BOUNDS):
            if n <= b:
                return i
        return len(LEN_BOUNDS)

    # model: per (source, bucket), docs in doc_id order, chopped into batches
    by_key: dict[tuple, list] = {}
    for doc_id, text, _l, src, _n in rows:
        n = len(text.split(" "))
        by_key.setdefault((src, bucket(n)), []).append(doc_id)
    model = {}
    for (src, b), ids in by_key.items():
        for pos, doc_id in enumerate(sorted(ids)):
            model[doc_id] = (src, b, pos // BATCH_SIZE, pos % BATCH_SIZE)

    got = {r.doc_id: (r.source, r.len_bucket, r.batch_seq, r.batch_pos)
           for r in batch_plan(spark, str(tmp_path)).collect()}
    assert got == model


def test_integrity_audit_flags_crafted_violations(spark, tmp_path):
    """The audit must count each planted defect exactly once: two orphan
    orders, three orphan lineitems, one out-of-range discount, one
    duplicated custkey, two empty/null documents."""
    from pyspark_coding_challenge_spark.llm.profiling import integrity_audit

    spark.createDataFrame(
        [(1, "a", 0, 1.0, "S"), (2, "b", 0, 2.0, "S"), (2, "dup", 0, 3.0, "S")],
        schema="c_custkey BIGINT, c_name STRING, c_nationkey INT, "
               "c_acctbal DOUBLE, c_mktsegment STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [(10, 1, "O", 5.0, "2024-01-01 00:00:00", "5-LOW"),
         (11, 99, "O", 5.0, "2024-01-01 00:00:00", "5-LOW"),
         (12, 98, "O", 5.0, "2024-01-01 00:00:00", "5-LOW")],
        schema="o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
               "o_totalprice DOUBLE, o_orderdate STRING, o_orderpriority STRING",
    ).selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
                 "o_orderpriority") \
     .write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    li_rows = [(10, 1, 1, 1, 5.0, 10.0, 0.1, 0.0, "N", "O", "2024-01-02 00:00:00"),
               (10, 1, 1, 2, 5.0, 10.0, 1.5, 0.0, "N", "O", "2024-01-02 00:00:00"),
               (77, 1, 1, 1, 5.0, 10.0, 0.1, 0.0, "N", "O", "2024-01-02 00:00:00"),
               (78, 1, 1, 1, 5.0, 10.0, 0.1, 0.0, "N", "O", "2024-01-02 00:00:00"),
               (79, 1, 1, 1, 5.0, 10.0, 0.1, 0.0, "N", "O", "2024-01-02 00:00:00")]
    spark.createDataFrame(
        li_rows,
        schema="l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
               "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
               "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
               "l_linestatus STRING, l_shipdate STRING",
    ).selectExpr("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus",
                 "CAST(l_shipdate AS TIMESTAMP) AS l_shipdate") \
     .write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [(1, "hello world", "en", "s", 11), (2, "", "en", "s", 0),
         (3, None, "en", "s", 0)],
        schema="doc_id BIGINT, text STRING, lang STRING, source STRING, "
               "n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    got = {r.metric: r.value
           for r in integrity_audit(spark, str(tmp_path)).collect()}
    assert got == {
        "orders_orphan_custkey": 2,
        "lineitem_orphan_orderkey": 3,
        "lineitem_discount_out_of_range": 1,
        "customer_dup_custkey": 1,
        "documents_empty_text": 2,
    }


def test_compact_parquet_merges_small_files_preserving_rows(spark, tmp_path):
    """200 tiny files in, a handful out; row content identical; the chosen
    file count derives from real input bytes (no data scan)."""
    import glob

    from pyspark_coding_challenge_spark.sources.writers import compact_parquet

    src = f"{tmp_path}/small"
    dst = f"{tmp_path}/compacted"
    df = spark.range(0, 20_000).selectExpr(
        "id", "CAST(id % 97 AS STRING) AS k", "id * 2.5 AS v")
    df.repartition(200).write.mode("overwrite").parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 200

    n = compact_parquet(spark, src, dst, target_file_mb=512)
    out_files = glob.glob(f"{dst}/part-*.parquet")
    assert len(out_files) == n <= 4
    before = {(r.id, r.k, r.v) for r in df.collect()}
    after = {(r.id, r.k, r.v) for r in spark.read.parquet(dst).collect()}
    assert after == before


def test_token_budget_sample_matches_python_model(spark, tmp_path):
    """Crafted corpus: the doc that CROSSES the per-source budget is kept,
    everything after it is dropped, consumption order is the salted-hash
    order, and a source smaller than the budget survives whole."""
    import hashlib

    from pyspark_coding_challenge_spark.llm.profiling import (
        TOKEN_BUDGET,
        token_budget_sample,
    )

    rows = []
    for doc_id in range(1, 9):  # big docs: 4 cross the budget quickly
        rows.append((doc_id, " ".join(["t"] * 9000), "en", "big", 9000))
    for doc_id in range(100, 103):  # tiny source: total 300 < budget
        rows.append((doc_id, " ".join(["t"] * 100), "en", "small", 100))
    spark.createDataFrame(
        rows, schema="doc_id BIGINT, text STRING, lang STRING, "
                     "source STRING, n_chars BIGINT"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    def fold60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    model = {}
    for src in ("big", "small"):
        docs = sorted((d for d in rows if d[3] == src),
                      key=lambda d: (fold60(f"tb:{d[0]}"), d[0]))
        cum = 0
        for doc_id, text, _l, _s, _n in docs:
            n = len(text.split(" "))
            if cum < TOKEN_BUDGET:
                model[doc_id] = (src, n, cum + n)
            cum += n

    got = {r.doc_id: (r.source, r.n_tokens, r.cum_tokens)
           for r in token_budget_sample(spark, str(tmp_path)).collect()}
    assert got == model
    # exactly ceil(budget/9000)=3 big docs kept, all small docs kept
    assert sum(1 for s, _, _ in got.values() if s == "big") == 3
    assert sum(1 for s, _, _ in got.values() if s == "small") == 3


def test_morton_code_matches_python_model(spark):
    from pyspark_coding_challenge_spark.sources.writers import morton_code

    def model(x, y, bits=16):
        code = 0
        for i in range(bits):
            code |= ((x >> i) & 1) << (2 * i)
            code |= ((y >> i) & 1) << (2 * i + 1)
        return code

    rows = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (50, 99),
            (2000, 100), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, schema="x BIGINT, y BIGINT")
    got = {(r.x, r.y): r.z
           for r in df.select("x", "y",
                              morton_code("x", "y").alias("z")).collect()}
    assert got == {(x, y): model(x, y) for x, y in rows}


def test_zorder_write_prunes_on_the_second_dimension(spark, tmp_path):
    """The layout claim, measured on real footer statistics: a predicate
    selective ONLY in the second clustering column must qualify far fewer
    row groups under Z-order than under a single-column sort (where every
    row group spans ~the full second-column domain and nothing prunes)."""
    import glob

    import pyarrow.parquet as pq

    from pyspark_coding_challenge_spark.sources.readers import read_table
    from pyspark_coding_challenge_spark.sources.writers import write_zordered_parquet

    li = read_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity")

    base = f"{tmp_path}/xsorted"
    li.repartitionByRange(16, "l_partkey").sortWithinPartitions("l_partkey") \
      .write.mode("overwrite").parquet(base)
    zpath = f"{tmp_path}/zordered"
    write_zordered_parquet(li, zpath, cols=("l_partkey", "l_suppkey"),
                           n_files=16, bits=8)

    def qualifying_rowgroups(path, lo, hi):
        total, hit = 0, 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = {md.schema.column(i).name: i for i in range(len(md.schema))}
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names["l_suppkey"]).statistics
                total += 1
                if st.min <= hi and st.max >= lo:
                    hit += 1
        return hit, total

    x_hit, x_total = qualifying_rowgroups(base, 10, 15)
    z_hit, z_total = qualifying_rowgroups(zpath, 10, 15)
    # same rows either way
    assert spark.read.parquet(zpath).count() == li.count()
    # single-column sort: every row group spans ~the whole suppkey domain
    assert x_hit == x_total
    # Z-order: the narrow suppkey band must skip at least half the groups
    assert z_hit * 2 <= z_total, (z_hit, z_total, x_hit, x_total)


def test_zorder_survives_huge_key_range(spark, tmp_path):
    """r6 review finding (execution-confirmed): snowflake-scale key ranges
    overflowed the old bigint (x-min)*top scaling and ANSI-aborted the
    write; the double-based scaling must write and keep both extremes in
    the right cells."""
    from pyspark.sql import functions as F

    from pyspark_coding_challenge_spark.sources.writers import write_zordered_parquet

    d = spark.range(1000).select(
        (F.col("id") * 4_000_000_000_000_000).alias("x"),
        (F.col("id") % 97).alias("y"),
        F.col("id").alias("payload"),
    )
    out = f"{tmp_path}/z"
    write_zordered_parquet(d, out, ("x", "y"), n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.agg(F.max("x")).collect()[0][0] == 999 * 4_000_000_000_000_000


def test_asof_join_ranked_rejects_outer_how(spark):
    import pytest as _pytest

    from pyspark_coding_challenge_spark.operators.asof import asof_join_ranked

    d = spark.createDataFrame([(1, 1)], "k bigint, t bigint")
    with _pytest.raises(ValueError, match="how"):
        asof_join_ranked(d, d, "k", ("t",), ("t",), how="full")


def test_asof_join_merge_form_rejects_outer_how(spark):
    import pytest as _pytest

    from pyspark_coding_challenge_spark.operators.asof import asof_join

    d = spark.createDataFrame([(1, 1)], "k bigint, t bigint")
    # merge path (right_within=None) must validate too — r6 advisory: the
    # guard had moved into asof_join_ranked only, so 'outer' fell through
    # to the tag filter and silently behaved as 'left'
    with _pytest.raises(ValueError, match="how"):
        asof_join(d, d, "k", ("t",), ("t",), how="outer")
