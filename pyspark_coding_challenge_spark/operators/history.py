"""Temporal anti-leakage history: per-entity last-K events strictly before a
cutoff, as fixed-length most-recent-first zero-padded parallel arrays.

This generalizes the reference's signature computation
(``pyspark-coding-challenge/src/pipeline.py:118-220``) with the SURVEY §4.4
fixes, and restructures it for scale:

* **True left semantics.** The reference applies the no-leakage predicate in a
  ``.where()`` *after* its ``left_outer`` join (``src/pipeline.py:159-160``),
  silently converting it to an inner join and dropping zero-history entities
  (SURVEY §4.4-2, verified). Here the temporal predicate lives **in the join
  condition**; zero-history entities come out as all-pad arrays via the
  caller-side left join + coalesce (``attach_history``).
* **Deterministic ordering.** ``ORDER BY time DESC`` alone is nondeterministic
  on timestamp ties (§4.4-3); we always add the payload columns as secondary
  sort keys.
* **Scale: history once per (entity, cutoff), not once per output row.** The
  reference joins the full action history onto *exploded impression items*
  (``src/pipeline.py:159``) and runs its window per impression row — each
  customer's actions are replicated per item shown. Since the cutoff is
  day-granular, every row of the same (customer, day) shares one history; we
  compute it once on the distinct (entity, cutoff) set and hash-join the
  small fixed-size arrays back. At 100 TB this cuts the join + window input
  by the average items-per-ranking factor (10-20x) and the heavy arrays are
  built AFTER aggregation, so shuffle payloads stay thin.
* **No hard-coded repartition.** The reference forces
  ``repartition(200, customer_id)`` (``src/pipeline.py:153-156``); we let the
  join/window shuffle on its natural keys and rely on AQE for coalescing and
  skew splitting (hot entities are exactly the AQE skew-join case).

Operator slugs covered: join_history_asof, window_topk, groupby_collect,
struct_pack, array_sort_structs, array_transform, array_pad_truncate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_coding_challenge_spark.functions.arrays import pad_truncate, sorted_parallel_arrays


def last_k_history(
    actions: DataFrame,
    cutoffs: DataFrame,
    k: int,
    entity_col: str = "customer_id",
    time_col: str = "action_time",
    cutoff_col: str = "cutoff_ts",
    payload_cols: tuple[str, ...] = ("item_id", "action_type"),
    out_cols: tuple[str, ...] = ("actions", "action_types"),
    pad: int = 0,
) -> DataFrame:
    """For each row of ``cutoffs`` (distinct ``entity_col, cutoff_col``),
    collect the entity's last ``k`` actions with ``time_col`` strictly before
    ``cutoff_col``, most-recent-first, padded/truncated to exactly ``k``.

    Returns ``entity_col, cutoff_col, *out_cols`` — INNER result: entities
    with zero qualifying history are absent (attach with ``attach_history``
    to get the all-pad rows).
    """
    act = actions.select(entity_col, time_col, *payload_cols)
    cut = cutoffs.select(entity_col, cutoff_col).distinct()

    joined = cut.join(
        act,
        on=[
            cut[entity_col] == act[entity_col],
            act[time_col] < cut[cutoff_col],
        ],
        how="inner",
    ).select(
        cut[entity_col], cut[cutoff_col], act[time_col], *[act[c] for c in payload_cols]
    )

    # Deterministic top-K per (entity, cutoff): time desc, then payloads asc.
    w = (
        Window.partitionBy(entity_col, cutoff_col)
        .orderBy(F.col(time_col).desc(), *[F.col(c).asc() for c in payload_cols])
    )
    topk = (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
    )

    # _rn FIRST in the struct: array_sort compares field-by-ordinal, so
    # sorting the collected structs restores recency order.
    grouped = topk.groupBy(entity_col, cutoff_col).agg(
        F.collect_list(F.struct(F.col("_rn"), *[F.col(c) for c in payload_cols])).alias("_structs")
    )
    per_field = sorted_parallel_arrays(F.col("_structs"), payload_cols)
    arrays = [
        pad_truncate(col, k, pad).alias(o)
        for col, o in zip(per_field, out_cols)
    ]
    return grouped.select(entity_col, cutoff_col, *arrays)


def attach_history(
    base: DataFrame,
    history: DataFrame,
    k: int,
    join_cols: tuple[str, ...],
    out_cols: tuple[str, ...] = ("actions", "action_types"),
    out_types: tuple[str, ...] = ("array<bigint>", "array<int>"),
    pad: int = 0,
) -> DataFrame:
    """Left-join per-entity history arrays onto ``base``; entities with no
    history get all-pad arrays (the documented contract the reference's
    inner-join bug violates — README.md:21, SURVEY §4.4-2).
    """
    joined = base.join(history, on=list(join_cols), how="left")
    fills = {
        o: F.coalesce(F.col(o), F.array_repeat(F.lit(pad), k)).cast(t).alias(o)
        for o, t in zip(out_cols, out_types)
    }
    return joined.select(
        *[c for c in joined.columns if c not in out_cols],
        *[fills[o] for o in out_cols],
    )
