"""Action-stream normalization (SURVEY §2.2, §2.3).

Reference parity: ``pyspark-coding-challenge/src/pipeline.py:33-64``
(``normalize_actions``). Three heterogeneous behavioural streams are mapped to
one schema ``(customer_id, item_id, action_time, action_type)`` and unioned by
name:

* clicks carry ``item_id``/``click_time``
* add-to-carts and orders carry ``config_id``/``occurred_at`` plus an unused
  ``simple_id`` that is projected away

Null keys/timestamps are rejected early (``src/pipeline.py:64``) — Catalyst
would push the filter anyway, but dropping garbage at the source keeps every
downstream operator's contract clean.

Operator slugs covered: project_cast_alias, literal, filter_notnull,
union_by_name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACTION_TYPE_CLICK = 1
ACTION_TYPE_ADD_TO_CART = 2
ACTION_TYPE_ORDER = 3
ACTION_TYPE_PAD = 0


def _project_clicks(clicks: DataFrame) -> DataFrame:
    return clicks.select(
        F.col("customer_id").cast("bigint").alias("customer_id"),
        F.col("item_id").cast("bigint").alias("item_id"),
        F.col("click_time").cast("timestamp").alias("action_time"),
        F.lit(ACTION_TYPE_CLICK).cast("int").alias("action_type"),
    )


def _project_carts(add_to_carts: DataFrame) -> DataFrame:
    return add_to_carts.select(
        F.col("customer_id").cast("bigint").alias("customer_id"),
        F.col("config_id").cast("bigint").alias("item_id"),
        F.col("occurred_at").cast("timestamp").alias("action_time"),
        F.lit(ACTION_TYPE_ADD_TO_CART).cast("int").alias("action_type"),
    )


def _project_orders(orders: DataFrame) -> DataFrame:
    return orders.select(
        F.col("customer_id").cast("bigint").alias("customer_id"),
        F.col("config_id").cast("bigint").alias("item_id"),
        F.col("occurred_at").cast("timestamp").alias("action_time"),
        F.lit(ACTION_TYPE_ORDER).cast("int").alias("action_type"),
    )


def normalize_actions(
    clicks: DataFrame, add_to_carts: DataFrame, orders: DataFrame
) -> DataFrame:
    """Union the three action streams into the canonical actions table.

    Narrow transformations only — stays in a single codegen stage until a
    downstream wide operator (SURVEY §3.2).
    """
    unioned = (
        _project_clicks(clicks)
        .unionByName(_project_carts(add_to_carts))
        .unionByName(_project_orders(orders))
    )
    return unioned.filter(
        F.col("customer_id").isNotNull()
        & F.col("item_id").isNotNull()
        & F.col("action_time").isNotNull()
    )
