"""Generic as-of join: for each left row, the single most recent right row
strictly earlier in a lexicographic (time, tiebreak...) order, per key.

The reference's history join (``pyspark-coding-challenge/src/pipeline.py:
159-160``) is the *all*-prior-rows cousin of this operator
(``operators/history.py``); this one returns exactly one match, the classic
point-in-time lookup Spark has no builtin for.

Implementation is the join + row_number composition: equi-join on the key
with the strict lexicographic inequality in the join condition (true left
semantics — no post-join filter, SURVEY §4.4-2), then keep the top-1 match
per left row deterministically.

Scale: the join shuffles both sides on ``on`` once; AQE skew-join splits hot
keys. Per key with L left and R right rows the intermediate is O(L*R) before
the rank filter — fine for per-entity cardinalities (orders per customer);
for long per-key streams use ``operators/history.py::rolling_last_k_history``
-style pre-bucketing or bound the lookback with ``right_within`` (a predicate
pushed into the join condition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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
    columns when ``how='left'``.

    ``(on, *left_order)`` must uniquely identify a left row (it is the match
    partition key); duplicate left rows would be collapsed to one.
    """
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
