"""Local replica of the driver's DuckDB-oracle comparison (SURVEY §5.3-2).

Runs a Spark DataFrame and a DuckDB SQL string over the same testdata parquet
and asserts order-insensitive value equality with columns sorted by name —
the same contract the driver's CORRECTNESS gate applies.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import numpy as np

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else round(f, 6)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    return v


def norm_rows(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    out = []
    for _, r in pdf.iterrows():
        out.append(tuple(_norm(r[c]) for c in cols))
    return sorted(out, key=repr)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str) -> None:
    con = duck_con(sf_dir)
    oracle_pdf = con.sql(sql).df()
    spark_pdf = spark_df.toPandas()
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"column mismatch: spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    s_rows, o_rows = norm_rows(spark_pdf), norm_rows(oracle_pdf)
    assert len(s_rows) == len(o_rows), f"row count: spark={len(s_rows)} oracle={len(o_rows)}"
    mismatches = [
        (i, s, o) for i, (s, o) in enumerate(zip(s_rows, o_rows)) if s != o
    ]
    assert not mismatches, f"first mismatches: {mismatches[:3]}"
