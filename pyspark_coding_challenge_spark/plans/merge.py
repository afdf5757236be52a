"""Section-merge helper: pack several related queries into ONE registered
slug without touching their semantics.

Why: the driver's CORRECTNESS gate records at most 50 slugs (observed:
CORRECTNESS_r02.json stops at exactly 50 entries, leaving the 17
last-registered slugs unchecked). Consolidating the relational micro-slug
sweeps into section-merged slugs brings the registry to exactly 50, so EVERY
operator family lands inside the checked window.

How: each part keeps its own query function and DuckDB oracle verbatim; the
merged Spark result is ``unionByName(allowMissingColumns=True)`` over the
parts with a ``section`` discriminator column, and the merged oracle is the
same parts composed with DuckDB's ``UNION ALL BY NAME``. Columns missing
from a part are NULL on BOTH sides, and shared column names keep their
native types (the parts were individually hash-green in round 2, so the
per-column parity is already proven — the merge adds no casts and no
reformatting). The driver sorts columns by name before hashing, so column
order differences between the two unions are immaterial.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


def merged_query(parts: list[tuple[str, QueryFn]],
                 concurrent: bool = False) -> QueryFn:
    """One query fn that unions the parts by name with a section tag.

    ``concurrent``: build the part DataFrames from a small thread pool
    (guide §2.6 — overlap independent jobs). Only worth it when part
    CONSTRUCTION does eager Spark work: the streaming sections each drive
    a full availableNow query to completion inside their fn, serially
    ~1.6 s apiece, and Spark's scheduler happily interleaves them (the
    conf pin they share is ref-counted for exactly this, and every
    section writes its own sink/checkpoint dirs). Lazily-composed parts
    gain nothing — their subtrees already execute concurrently inside the
    one union job. Union ORDER is preserved either way (pool.map returns
    in input order), so the result is row-identical to the serial build."""
    if not parts:
        # fail at registration, not as an opaque NoneType error when the
        # driver later calls the slug
        raise ValueError("merged_query requires at least one part")

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        if concurrent and len(parts) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(4, len(parts))) as pool:
                dfs = list(pool.map(lambda p: p[1](spark, sf_dir), parts))
        else:
            dfs = [part_fn(spark, sf_dir) for _, part_fn in parts]
        out = None
        for (name, _), df in zip(parts, dfs):
            df = df.select(F.lit(name).alias("section"), "*")
            out = df if out is None else out.unionByName(df, allowMissingColumns=True)
        return out

    return fn


def merged_oracle(parts: list[tuple[str, str]]) -> str:
    """The DuckDB twin of ``merged_query`` over the parts' oracle SQL."""
    return "\nUNION ALL BY NAME\n".join(
        f"SELECT '{name}' AS section, * FROM (\n{sql}\n)" for name, sql in parts
    )


# slug -> section names, populated at registration. Introspection source
# for scripts/bench_isolated.py's per-slug section counts (r5 verdict #7:
# scope growth must be machine-checkable in the artifact, not narrated) —
# a slug absent here is unmerged, i.e. one section.
SECTION_REGISTRY: dict[str, list[str]] = {}


def register_merged(register, slug: str,
                    parts: list[tuple[str, QueryFn, str]],
                    concurrent: bool = False) -> None:
    """Register one merged slug from (section, query_fn, oracle_sql) parts."""
    SECTION_REGISTRY[slug] = [name for name, _, _ in parts]
    register(
        slug,
        merged_query([(name, fn) for name, fn, _ in parts],
                     concurrent=concurrent),
        merged_oracle([(name, sql) for name, _, sql in parts]),
    )
