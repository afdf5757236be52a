"""Explicit DDL schemas for every table the engine touches.

The reference relies on schema inference in its tests and that is exactly what
breaks them on PySpark 4.x (``CANNOT_INFER_TYPE_FOR_FIELD``,
``pyspark-coding-challenge/tests/test_pipeline.py:64-82`` — SURVEY §5.2).
This engine *declares* every schema.

Reference input tables (``pyspark-coding-challenge/src/pipeline.py:41-75``):
the four behavioural tables of the recommender feature pipeline. Driver
testdata tables (``TESTDATA.md``): TPC-H-ish star schema + events/documents/
embeddings.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Reference-shaped tables (FIXTURES.md §A)
# ---------------------------------------------------------------------------

IMPRESSIONS_DDL = (
    "dt STRING, ranking_id STRING, customer_id BIGINT, "
    "impressions ARRAY<STRUCT<item_id: BIGINT, is_order: BOOLEAN>>"
)

CLICKS_DDL = "dt STRING, customer_id BIGINT, item_id BIGINT, click_time TIMESTAMP"

ADD_TO_CARTS_DDL = (
    "dt STRING, customer_id BIGINT, config_id BIGINT, simple_id INT, "
    "occurred_at TIMESTAMP"
)

ORDERS_ACTIONS_DDL = (
    "order_date STRING, customer_id BIGINT, config_id BIGINT, simple_id INT, "
    "occurred_at TIMESTAMP"
)

# Normalized internal action table (``src/pipeline.py:34-40``).
ACTIONS_DDL = "customer_id BIGINT, item_id BIGINT, action_time TIMESTAMP, action_type INT"

# Output contract (``src/pipeline.py:14-22``, README.md:13-22).
TRAINING_EXAMPLE_DDL = (
    "dt STRING, ranking_id STRING, customer_id BIGINT, impression_pos INT, "
    "impression_item_id BIGINT, label INT, actions ARRAY<BIGINT>, "
    "action_types ARRAY<INT>"
)

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md / FIXTURES.md §B)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EVENTS_DDL = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)

DOCUMENTS_DDL = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

EMBEDDINGS_DDL = "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
