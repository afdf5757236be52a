"""Generic as-of join: for each left row, the single most recent right row
strictly earlier in a lexicographic (time, tiebreak...) order, per key.

The reference's history join (``pyspark-coding-challenge/src/pipeline.py:
159-160``) is the *all*-prior-rows cousin of this operator
(``operators/history.py``); this one returns exactly one match, the classic
point-in-time lookup Spark has no builtin for.

Two implementations, identical semantics (equivalence property-tested):

* ``asof_join`` (default) — the MERGE form: union both sides tagged, one
  shuffle on the key, sort by (order..., side-tag) inside each partition,
  and carry the latest right payload to each left row with
  ``last(ignorenulls)`` over a ``(unbounded preceding, -1)`` frame. Cost is
  O((L+R) log (L+R)) per key with NO pair expansion — this is the shape
  that survives hot keys at 100 TB (the round-2 join+rank form built an
  O(L*R) per-key intermediate before its rank filter).
* ``asof_join_ranked`` — the join + row_number composition: equi-join on
  the key with the strict lexicographic inequality in the join condition
  (true left semantics — no post-join filter, SURVEY §4.4-2), then top-1
  per left row. Kept for ``right_within`` (an arbitrary bounded-lookback
  predicate pushed into the join condition, which the merge form cannot
  express) and as the semantic reference.

Order columns must be non-null on both sides: the merge form sorts
ascending (Spark: NULLS FIRST), so a null right time would read as
"earlier than everything", while the ranked form's ``<`` rejects it —
pre-filter nulls (the reference's pipelines do, src/pipeline.py:64).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _check_orders(left_order: tuple[str, ...], right_order: tuple[str, ...]) -> None:
    """The order tuples are compared positionally; unequal lengths would be
    silently zip-truncated (ranked form: tiebreak compared against time;
    merge form: trailing NULL order columns sort NULLS FIRST) — fail loudly
    instead of returning semantically wrong matches."""
    if len(left_order) != len(right_order) or not left_order:
        raise ValueError(
            "left_order and right_order must be non-empty and the same "
            f"length, got {left_order!r} vs {right_order!r}"
        )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_order: tuple[str, ...],
    right_order: tuple[str, ...],
    how: str = "left",
    right_within: Column | None = None,
) -> DataFrame:
    """Attach to each ``left`` row the lexicographically greatest ``right``
    row with ``(right_order...) < (left_order...)`` and the same ``on`` key.

    ``left_order`` / ``right_order`` are parallel column tuples defining the
    strict lexicographic comparison (first element is the time column; the
    rest are deterministic tie-breaks). Unmatched left rows keep null right
    columns when ``how='left'`` and are dropped when ``how='inner'``.
    """
    _check_orders(left_order, right_order)
    if how not in ("left", "inner"):
        # duplicated in asof_join_ranked for direct callers; without this
        # copy the merge path would silently treat e.g. 'outer' as 'left'
        # (the tag filter below only ever keeps left rows)
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")
    if right_within is not None:
        return asof_join_ranked(left, right, on, left_order, right_order,
                                how, right_within)

    # Equi-join semantics for NULL keys: a window partitionBy GROUPS null
    # keys (a NULL-keyed right row would match a NULL-keyed left row) while
    # the ranked form's equi-join rejects them — drop NULL-keyed right rows
    # so both forms give NULL-keyed left rows no match.
    right = right.filter(F.col(on).isNotNull())

    rpay = [c for c in right.columns if c != on]
    ords = [f"_asof_o{i}" for i in range(len(left_order))]

    # Reserved working names must be absent from the inputs (r10 review
    # finding): a left column literally named '_asof_m' would be silently
    # OVERWRITTEN by withColumn below and emitted as the match struct
    # under the user's name — corrupt output, no error. '_asof_tag'/the
    # order aliases at least fail with an ambiguity AnalysisException;
    # make every collision loud and uniform instead.
    reserved = {"_asof_m", "_asof_tag", "_asof_rpay", *ords}
    clash = reserved.intersection(left.columns).union(
        reserved.intersection(right.columns)
    )
    if clash:
        raise ValueError(
            f"asof_join reserves column names {sorted(reserved)}; "
            f"rename input columns {sorted(clash)}"
        )

    # Left rows tag 0, right rows tag 1: at equal order values the left row
    # sorts FIRST, so an equal-order right row is NOT in its preceding
    # frame — the strict (<) contract.
    lt = left.select(
        "*",
        *[F.col(c).alias(o) for c, o in zip(left_order, ords)],
        F.lit(0).alias("_asof_tag"),
    )
    rt = right.select(
        F.col(on),
        *[F.col(c).alias(o) for c, o in zip(right_order, ords)],
        F.lit(1).alias("_asof_tag"),
        F.struct(*rpay).alias("_asof_rpay"),
    )
    u = lt.unionByName(rt, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(*[F.col(o).asc() for o in ords], F.col("_asof_tag").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = (
        u.withColumn("_asof_m", F.last("_asof_rpay", ignorenulls=True).over(w))
        .filter(F.col("_asof_tag") == 0)
    )
    if how == "inner":  # how validated at entry
        carried = carried.filter(F.col("_asof_m").isNotNull())
    return carried.select(
        *left.columns,
        *[F.col("_asof_m").getField(c).alias(c) for c in rpay],
    )


def asof_join_ranked(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_order: tuple[str, ...],
    right_order: tuple[str, ...],
    how: str = "left",
    right_within: Column | None = None,
) -> DataFrame:
    """Join+rank form of ``asof_join`` (see module doc). ``(on,
    *left_order)`` must uniquely identify a left row (it is the match
    partition key); duplicate left rows would be collapsed to one. Per key
    with L left and R right rows the intermediate is O(L*R) before the rank
    filter — use the merge form unless ``right_within`` is needed."""
    _check_orders(left_order, right_order)
    if how not in ("left", "inner"):
        # the guard lives HERE (not only in the asof_join wrapper, r6
        # review finding) so direct callers hit it too: an outer join
        # would emit unmatched right rows with all-NULL left columns,
        # which collapse into one NULL window partition and surface as a
        # single nondeterministic phantom row
        raise ValueError(
            f"asof_join_ranked supports how='left'|'inner', got {how!r}"
        )
    lt = left.alias("l")
    rt = right.alias("r")

    def lex_lt() -> Column:
        # (r1,r2,..) < (l1,l2,..) lexicographic, built right-to-left.
        cond = F.lit(False)
        for lc, rc in zip(reversed(left_order), reversed(right_order)):
            lcol, rcol = F.col(f"l.{lc}"), F.col(f"r.{rc}")
            cond = (rcol < lcol) | ((rcol == lcol) & cond)
        return cond

    join_cond = (F.col(f"l.{on}") == F.col(f"r.{on}")) & lex_lt()
    if right_within is not None:
        join_cond = join_cond & right_within

    joined = lt.join(rt, join_cond, how)

    left_cols = [F.col(f"l.{c}") for c in left.columns]
    right_cols = [F.col(f"r.{c}").alias(c) for c in right.columns if c != on]

    # Top-1 match per left row: rank right rows descending in their order.
    w = Window.partitionBy(*[F.col(f"l.{c}") for c in (on, *left_order)]).orderBy(
        *[F.col(f"r.{c}").desc_nulls_last() for c in right_order]
    )
    return (
        joined.withColumn("_asof_rn", F.row_number().over(w))
        .filter(F.col("_asof_rn") == 1)
        .select(*left_cols, *right_cols)
    )
