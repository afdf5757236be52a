"""Subquery-shaped relational coverage: EXISTS / NOT EXISTS / IN-subquery /
correlated scalar subqueries / scalar-subquery HAVING — the TPC-H query
patterns (Q4, Q13, Q11, Q15, Q17, Q18, Q19, Q22 shapes) that the plain
join/agg sweeps in ``plans/relational.py`` do not exercise.

Why SQL text for some of these: predicate subqueries (EXISTS / NOT EXISTS /
IN) are exactly the case where the declarative surface matters — Catalyst's
``RewritePredicateSubquery`` rule turns them into the semi/anti-join plans
we would otherwise hand-build, and letting the optimizer do it keeps the
query one logical plan (so pushdown and join reordering still apply across
the subquery boundary); the plan gates pin that rewrite. CORRELATED SCALAR
aggregates are the measured exception: Catalyst decorrelates each scalar
subquery separately (one extra scan + aggregate per subquery — see
``correlated_small_quantity``), so there the engine spells the
decorrelated single-pass form directly and keeps the subquery SQL as the
oracle. The plain IN/semi family is written with the DataFrame API
(``left_semi`` / ``left_anti``) because there the join form *is* the
idiomatic Spark spelling.

Oracle-parity rules follow ``plans/relational.py``'s module doc: scalar
output columns, exact-integer money/quantity arithmetic (no double-threshold
boundary can flip between engines — every comparison against an average is
rewritten as ``value * count  <op>  sum`` over bigints), identical aliases on
both sides.

Scale notes (100 TB): every shape here decorrelates to one shuffle on the
correlation key plus a broadcast of any 1-row scalar aggregate. None of them
pair-expands: the Q17/Q18 per-key aggregates are map-side partial, the
EXISTS/NOT-EXISTS forms are semi/anti joins (no row multiplication), and the
scalar subqueries (Q11/Q15/Q22) are single-row broadcasts. The fact-to-fact
shuffles key on ``l_orderkey`` / ``l_partkey`` — high-cardinality, unskewed
keys — and AQE handles any residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_coding_challenge_spark.sources.readers import read_table


from pyspark_coding_challenge_spark.functions.money import cents as _cents  # noqa: E402


def _view(spark: SparkSession, sf_dir: str, table: str) -> str:
    """Register ``read_table``'s canonicalized DataFrame as a temp view and
    return the view name for SQL text. The name carries an ``sf_dir``
    digest (same idiom as ``relational.sink_parquet``'s path tag): a name
    keyed only on the table would let concurrent construction of the same
    slug against two sf_dirs race createOrReplaceTempView vs spark.sql and
    bind the wrong directory's data (r5 advisory)."""
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    name = f"sq_{table}_{tag}"
    read_table(spark, sf_dir, table).createOrReplaceTempView(name)
    return name


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS correlated semi-join
# ---------------------------------------------------------------------------

def exists_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders (one quarter) having at least one line item shipped after the
    order date — correlated EXISTS, counted per priority bucket.

    Catalyst rewrites the EXISTS into a LEFT SEMI join on ``o_orderkey``
    with the ``l_shipdate > o_orderdate`` correlation as the join's extra
    predicate: no row multiplication, one shuffle keyed on orderkey, with
    the quarter filter pushed to the orders scan."""
    o = _view(spark, sf_dir, "orders")
    li = _view(spark, sf_dir, "lineitem")
    # The `l_shipdate > timestamp'1996-01-01'` inside EXISTS is IMPLIED by
    # the correlation (l_shipdate > o_orderdate >= 1996-01-01) but Catalyst
    # does not derive it across the subquery boundary — writing it out by
    # hand pushes a date bound into the lineitem parquet scan, which at
    # 100 TB skips every row group outside the window. Result-identical.
    return spark.sql(f"""
        SELECT o_orderpriority, count(*) AS order_count
        FROM {o}
        WHERE o_orderdate >= timestamp'1996-01-01'
          AND o_orderdate <  timestamp'1996-04-01'
          AND EXISTS (SELECT 1 FROM {li}
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate
                        AND l_shipdate > timestamp'1996-01-01')
        GROUP BY o_orderpriority
    """)


EXISTS_LATE_SHIPMENTS_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""  # oracle omits the hand-derived bound: semantically identical


# ---------------------------------------------------------------------------
# Q18 shape: IN over a grouped-HAVING subquery
# ---------------------------------------------------------------------------

def in_big_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers holding orders whose total line quantity exceeds 180 —
    the classic IN (SELECT ... GROUP BY ... HAVING) shape.

    DataFrame spelling: the HAVING subquery is a map-side-partial groupBy on
    ``l_orderkey``; membership is a LEFT SEMI join (Catalyst produces the
    same plan for the SQL IN form). Quantities are integral in this data,
    so the bigint cast keeps the threshold comparison exact."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .filter(F.col("total_qty") > 180)
    )
    # No broadcast hint on customer: at 100 TB customer is a 10^8-row table,
    # while the big-quantity filter shrinks the LEFT side to almost nothing.
    # AQE's runtime stats see the shrunken side and pick the broadcast
    # direction at execution time — hard-hinting the full dimension would
    # pin the wrong side forever.
    return (
        o.join(big.select("l_orderkey", "total_qty"),
               o.o_orderkey == F.col("l_orderkey"), "inner")
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").cast("string").alias("orderdate"),
            _cents("o_totalprice").alias("totalprice_cents"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


IN_BIG_QUANTITY_ORDERS_ORACLE = """
SELECT c_custkey, c_name, o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
       CAST(ROUND(o_totalprice*100) AS BIGINT) AS totalprice_cents,
       big.total_qty
FROM orders
JOIN (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING total_qty > 180) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY big.total_qty DESC, o_orderkey
LIMIT 25
"""


# ---------------------------------------------------------------------------
# Q22 shape: NOT EXISTS anti-join gated by a scalar-subquery threshold
# ---------------------------------------------------------------------------

def not_exists_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation count/balance of customers with above-average positive
    balance and NO orders — scalar subquery (global average) + NOT EXISTS.

    The average threshold is compared in exact integers
    (``bal_cents * n_positive > sum_cents``  ⇔  ``bal > avg``), so the two
    engines cannot disagree on a boundary row the way an IEEE-double average
    could. Catalyst turns the NOT EXISTS into a LEFT ANTI join and the
    scalar aggregate into a 1-row broadcast — customers stream through one
    shuffle-free filter plus one anti-join on ``o_custkey``.

    The 1-row threshold rides a CROSS JOIN of the CTE rather than two
    scalar ``(SELECT ... FROM pos)`` expressions: Spark inlines CTEs per
    reference, so the scalar spelling evaluated ``pos`` TWICE (measured: 6
    scans / 10 aggregates; the cross-join form is 3 scans — customer for
    pos, customer main, orders — which is the minimum for this shape)."""
    c = _view(spark, sf_dir, "customer")
    o = _view(spark, sf_dir, "orders")
    return spark.sql(f"""
        WITH pos AS (
            SELECT CAST(count(*) AS BIGINT) AS n_pos,
                   CAST(sum(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_cents
            FROM {c} WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey,
               count(*) AS numcust,
               CAST(sum(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT)
                 AS totacctbal_cents
        FROM {c} CROSS JOIN pos
        WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) * n_pos > sum_cents
          AND NOT EXISTS (SELECT 1 FROM {o} WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
    """)


NOT_EXISTS_IDLE_CUSTOMERS_ORACLE = """
WITH pos AS (
    SELECT CAST(count(*) AS BIGINT) AS n_pos,
           CAST(sum(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey,
       count(*) AS numcust,
       CAST(sum(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
FROM customer
WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) * (SELECT n_pos FROM pos)
      > (SELECT sum_cents FROM pos)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive multi-attribute join predicate
# ---------------------------------------------------------------------------

def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue over an OR of three (brand, size-range, quantity-range)
    conjunctions — the predicate shape that defeats naive pushdown.

    The equi-key ``l_partkey = p_partkey`` is shared by every disjunct, so
    Spark plans a plain broadcast hash join with the disjunction evaluated
    as the join's residual filter — NOT a cartesian fallback; the
    common-key extraction is exactly what Catalyst's join-condition
    analysis is for. The part side is PRE-FILTERED to the part-only half
    of each disjunct (brand + size) before the broadcast hint: any row
    satisfying the full condition has its part row satisfying one of
    those clauses, so the filter is result-preserving — and it is what
    makes the broadcast legitimate at scale (three brand slices of the
    dimension, not the full 10^10-row part table)."""
    part_clause = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15))
    )
    p = read_table(spark, sf_dir, "part").filter(part_clause)
    li = read_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & qty.between(20, 30))
    )
    revenue_e4 = F.sum(
        _cents("l_extendedprice")
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .groupBy("p_brand")
        .agg(revenue_e4.alias("revenue_e4"), F.count("*").alias("line_cnt"))
        .select("p_brand", "revenue_e4", "line_cnt")
    )


DISJUNCTIVE_BRAND_REVENUE_ORACLE = """
SELECT p_brand,
       CAST(sum(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
         AS revenue_e4,
       count(*) AS line_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# Q17 shape: correlated scalar aggregate (below-half-average line items)
# ---------------------------------------------------------------------------

def correlated_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value locked in 'small' orders: line items of one brand with quantity
    below half that part's average quantity — the TPC-H Q17 correlated-
    scalar-aggregate shape.

    ``qty < 0.5 * avg``  is evaluated as  ``2 * qty * count < sum`` in
    bigints: no engine-dependent IEEE average can flip a boundary row.

    Why NOT the SQL correlated-subquery spelling here (the oracle keeps
    it): measured on Spark 4, Catalyst decorrelates the two scalar
    subqueries SEPARATELY — two extra lineitem scans and aggregates
    (6 HashAggregates, 4 scans); the subquery-merging rule does not cover
    this correlated pair. The hand-decorrelated form below is what a
    100 TB run wants: ONE scan of lineitem (pre-reduced by broadcasting
    the brand-filtered part keys into the join), ONE shuffle on
    ``l_partkey`` for a window computing the per-part count/sum alongside
    every probe row, and the final global aggregate. No self-join, no
    re-aggregation."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    li = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    probe = (
        li.join(F.broadcast(p.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"))
        .select("l_partkey",
                F.col("l_quantity").cast("bigint").alias("qty"),
                _cents("l_extendedprice").alias("price_cents"))
        .withColumn("_cnt", F.count("*").over(w))
        .withColumn("_sum_qty", F.sum("qty").over(w))
        .filter(2 * F.col("qty") * F.col("_cnt") < F.col("_sum_qty"))
    )
    return probe.agg(
        F.count("*").alias("n_small"),
        F.sum("price_cents").alias("value_cents"),
    )


CORRELATED_SMALL_QUANTITY_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_small,
       CAST(sum(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM lineitem l JOIN part ON p_partkey = l.l_partkey
WHERE p_brand = 'Brand#4'
  AND 2 * CAST(l.l_quantity AS BIGINT)
      * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
      < (SELECT sum(CAST(l2.l_quantity AS BIGINT)) FROM lineitem l2
         WHERE l2.l_partkey = l.l_partkey)
"""


# ---------------------------------------------------------------------------
# Q13 shape: outer-join count distribution
# ---------------------------------------------------------------------------

def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-customer order counts (including zero) with a
    filtered join condition — LEFT OUTER join whose predicate lives in the
    ON clause (not a post-filter, which would drop the zero bucket).

    Two shuffles: customer⋈orders on custkey, then the tiny count-of-counts
    regroup. ``count(o_orderkey)`` counts only matched rows — the
    outer-join null semantics the shape exists to exercise."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, (c.c_custkey == o.o_custkey)
               & (o.o_orderpriority != "1-URGENT"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .select("c_count", "custdist")
    )


ORDER_COUNT_DISTRIBUTION_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q11 shape: HAVING against a scalar subquery (share-of-global threshold)
# ---------------------------------------------------------------------------

def nation_balance_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier account balance concentrated per nation, keeping nations
    holding more than 1/25 of the global positive balance — the
    share-of-global HAVING shape, compared exactly as
    ``25 * nation_sum > global_sum``.

    ONE scan: aggregate to nation level first, then the global sum is a
    window over the ALREADY-AGGREGATED relation (bounded by the number of
    nations — dozens of rows, so the unpartitioned window is safe; the SQL
    scalar-subquery spelling scans supplier twice). For a share-of-global
    over a HIGH-cardinality group (per-token, per-document) the right form
    is the 1-row aggregate broadcast instead — an unpartitioned window
    over millions of groups would single-partition them."""
    s = read_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 0.0)
    per_nation = s.groupBy("s_nationkey").agg(
        F.sum(_cents("s_acctbal")).alias("nation_bal_cents")
    )
    total = F.sum("nation_bal_cents").over(
        Window.partitionBy()  # nation-level relation: bounded rows
    )
    return (
        per_nation.withColumn("_total", total)
        .filter(25 * F.col("nation_bal_cents") > F.col("_total"))
        .select("s_nationkey", "nation_bal_cents")
    )


NATION_BALANCE_SHARE_ORACLE = """
SELECT s_nationkey,
       CAST(sum(CAST(ROUND(s_acctbal*100) AS BIGINT)) AS BIGINT)
         AS nation_bal_cents
FROM supplier
WHERE s_acctbal > 0.0
GROUP BY s_nationkey
HAVING 25 * sum(CAST(ROUND(s_acctbal*100) AS BIGINT))
       > (SELECT sum(CAST(ROUND(s_acctbal*100) AS BIGINT))
          FROM supplier WHERE s_acctbal > 0.0)
"""


# ---------------------------------------------------------------------------
# Q15 shape: equality against a scalar MAX over an aggregate (top supplier)
# ---------------------------------------------------------------------------

def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) whose one-quarter shipped revenue equals the maximum —
    the aggregate-of-aggregate scalar-subquery shape (TPC-H's revenue
    view + max join).

    The per-supplier revenue aggregate feeds BOTH consumers (the max and
    the equality probe), so it is materialized ONCE with
    ``localCheckpoint`` (the repo's materialize-once idiom, see
    ``llm/dedup.py``; on a cluster: persist/checkpoint — the storage is
    reclaimed by the ContextCleaner when the result is dropped). The SQL
    CTE spelling re-evaluated the revenue subtree — 2 lineitem scans;
    this form scans lineitem once, and the aggregated relation it
    re-reads is |suppliers|-sized, orders of magnitude smaller. Revenue
    is exact-integer e4 so the max-equality cannot be split by rounding.
    Deterministic even under ties — all tied suppliers return."""
    s = read_table(spark, sf_dir, "supplier")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("timestamp'1996-01-01'"))
        & (F.col("l_shipdate") < F.expr("timestamp'1996-04-01'"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            _cents("l_extendedprice")
            * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
        ).alias("total_rev_e4")
    ).localCheckpoint()
    mx = revenue.agg(F.max("total_rev_e4").alias("_max_rev"))
    winners = revenue.join(
        F.broadcast(mx), F.col("total_rev_e4") == F.col("_max_rev")
    )
    # Broadcast the ~1-row winners side INTO supplier (which is 10^9 rows
    # at the target scale), never the full supplier dimension.
    return (
        s.join(F.broadcast(winners), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_rev_e4")
    )


TOP_REVENUE_SUPPLIER_ORACLE = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(sum(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount*100) AS BIGINT)))
                AS BIGINT) AS total_rev_e4
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev_e4
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Salted skewed JOIN (complement to agg_salted_skew's salted aggregation)
# ---------------------------------------------------------------------------

SALT_BUCKETS = 8


def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dimension join on a pathologically skewed key
    ((l_returnflag, l_linestatus) has ~6 values over the whole fact table),
    decomposed with an explicit salt: the fact side gets
    ``salt = pmod(xxhash64(row-key), 8)``; the dim side is exploded 8x so
    every (key, salt) pair exists exactly once — each fact row still matches
    exactly ONE dim row, so the join result is row-for-row identical to the
    unsalted join (which is what the oracle runs).

    Why not broadcast: at this size broadcast is the right call (and
    the other sections do it); this section deliberately pins the
    shuffle-join-under-skew pattern for the case where the dim side is too
    big to broadcast — the SHUFFLE_HASH hint suppresses the broadcast
    strategy so the salt demonstrably spreads the hot keys across
    6*8 = 48 reducer keys instead of 6. AQE's skew-join split handles
    moderate sort-merge skew on its own; explicit salting is the remedy for
    single-hot-key hash joins it can't split.

    The per-group average comparison is exact-integer
    (``qty * cnt > sum_qty``  ⇔  ``qty > avg``): no double boundary."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"),
               F.lit(SALT_BUCKETS)).alias("_salt"),
    )
    dim = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("_sum_qty"),
             F.count("*").alias("_cnt"))
        .withColumn("_salt", F.explode(F.sequence(F.lit(0).cast("bigint"),
                                                  F.lit(SALT_BUCKETS - 1).cast("bigint"))))
    )
    # The hint rides the DIM side: the hinted relation becomes the hash
    # join's BUILD side, and building from the (exploded but still tiny)
    # dim is the whole point — hinting the fact side would make every
    # reducer hash-build its slice of the fact table instead.
    joined = li.join(
        dim.hint("shuffle_hash"),
        on=["l_returnflag", "l_linestatus", "_salt"], how="inner"
    )
    return (
        joined.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_lines"),
             F.sum((F.col("qty") * F.col("_cnt") > F.col("_sum_qty"))
                   .cast("bigint")).alias("n_above_avg"))
        .select("l_returnflag", "l_linestatus", "n_lines", "n_above_avg")
    )


SALTED_SKEW_JOIN_ORACLE = """
WITH dim AS (
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           count(*) AS cnt
    FROM lineitem GROUP BY l_returnflag, l_linestatus
)
SELECT li.l_returnflag, li.l_linestatus,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN CAST(li.l_quantity AS BIGINT) * dim.cnt > dim.sum_qty
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_above_avg
FROM lineitem li
JOIN dim ON li.l_returnflag = dim.l_returnflag
        AND li.l_linestatus = dim.l_linestatus
GROUP BY li.l_returnflag, li.l_linestatus
"""


# ---------------------------------------------------------------------------
# Q7 shape: nation-pair trade volume (disjunctive pair predicate)
# ---------------------------------------------------------------------------

def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping volume between two specific nations, BOTH directions, per
    year — the Q7 shape: two nation dimensions joined to the two fact-side
    keys with the disjunctive pair condition
    ``(supp=A and cust=B) or (supp=B and cust=A)``.

    Scale shape (r6 verdict finding #1): the NAME-FILTERED nation dims
    (2 of 25 rows) broadcast onto customer and supplier, and those pruned
    dims join their fact side BEFORE the fact-to-fact orderkey join —
    ``o2 = orders ⋈ c2`` (custkey shuffle over the ~8%-selectivity
    customer survivors) and ``li2 = lineitem ⋈ s2`` (suppkey shuffle),
    THEN ``li2 ⋈ o2`` on orderkey, exactly the sibling Q8 pattern. Both
    orderkey-shuffle inputs shrink ~12× versus shuffling the full facts
    first; Catalyst's heuristic ReorderJoin keeps the written order, so
    writing the pruning joins first IS the plan (gated in
    tests/test_plan_quality.py::test_nation_pair_prunes_before_orderkey).
    The disjunctive pair condition remains a residual filter over the
    two-nation survivors (it must exclude the (3,3)/(7,7) combinations)."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    target = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    n1 = target.select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation"))
    n2 = target.select(
        F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation"))
    s2 = s.join(F.broadcast(n1), s.s_nationkey == F.col("_sk")).select(
        "s_suppkey", "supp_nation")
    c2 = c.join(F.broadcast(n2), c.c_nationkey == F.col("_ck")).select(
        "c_custkey", "cust_nation")
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    vol_e4 = F.sum(
        _cents("l_extendedprice")
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
    )
    o2 = o.join(c2, o.o_custkey == c2.c_custkey).select(
        "o_orderkey", "cust_nation")
    li2 = li.join(s2, li.l_suppkey == s2.s_suppkey).select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount",
        "supp_nation")
    return (
        li2.join(o2, li2.l_orderkey == o2.o_orderkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(vol_e4.alias("volume_e4"))
        .select("supp_nation", "cust_nation", "l_year", "volume_e4")
    )


NATION_PAIR_VOLUME_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(sum(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
         AS volume_e4
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


# ---------------------------------------------------------------------------
# Q8 shape: market share — ratio of conditional sums
# ---------------------------------------------------------------------------

def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's share of a region's order volume per year — the Q8
    shape: the numerator is a CONDITIONAL sum (volume where the supplier
    is the target nation) over the same rows as the denominator, so the
    share is one aggregate pass with a CASE inside, never two scans.

    Exact-integer numerator/denominator (e4 units); only the final ratio
    divides as double, rounded for the hash.

    Scale shape (r6 review finding): the region-filtered nation dim
    broadcasts onto customer FIRST, and the region-pruned orders join the
    facts — rows that can never satisfy the region predicate are dropped
    before the expensive custkey/suppkey shuffles instead of after. The
    supplier dim (needed unfiltered for the denominator) pre-joins its
    broadcast nation lookup the same way."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n_c = (
        read_table(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 2)  # customers in ASIA
        .select(F.col("n_nationkey").alias("_ck"))
    )
    n_s = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation"))
    c2 = c.join(F.broadcast(n_c), c.c_nationkey == F.col("_ck")).select("c_custkey")
    s2 = s.join(F.broadcast(n_s), s.s_nationkey == F.col("_sk")).select(
        "s_suppkey", "supp_nation")
    o2 = o.join(c2, o.o_custkey == c2.c_custkey).select("o_orderkey", "o_orderdate")
    vol = (
        _cents("l_extendedprice")
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
    )
    target = (F.col("supp_nation") == "NATION_2").cast("bigint")
    return (
        li.join(o2, li.l_orderkey == o2.o_orderkey)
        .join(s2, li.l_suppkey == s2.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(vol * target).alias("nation_vol_e4"),
            F.sum(vol).alias("total_vol_e4"),
        )
        .select(
            "o_year",
            "nation_vol_e4",
            "total_vol_e4",
            F.round(
                F.col("nation_vol_e4").cast("double") / F.col("total_vol_e4"), 6
            ).alias("mkt_share"),
        )
    )


MARKET_SHARE_ORACLE = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
                     THEN CAST(ROUND(l_extendedprice*100) AS BIGINT)
                          * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                     ELSE 0 END) AS BIGINT) AS nation_vol_e4,
       CAST(sum(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
         AS total_vol_e4,
       ROUND(CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
                           THEN CAST(ROUND(l_extendedprice*100) AS BIGINT)
                                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                           ELSE 0 END) AS DOUBLE)
             / sum(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount*100) AS BIGINT))), 6)
         AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey AND n1.n_regionkey = 2
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
GROUP BY year(o_orderdate)
"""
