"""Local replica of the driver's DuckDB-oracle comparison (SURVEY §5.3-2).

Runs a Spark DataFrame and a DuckDB SQL string over the same testdata parquet
and asserts order-insensitive value equality with columns sorted by name —
the same contract the driver's CORRECTNESS gate applies.

KNOWN BACKEND ASYMMETRY (why the parity rules mandate casting dates to
string): a raw DATE column arrives as ``datetime.date`` from Spark but as a
midnight ``pandas.Timestamp`` from DuckDB's ``.df()`` — indistinguishable
from a midnight TIMESTAMP, so this harness cannot paper over it. Registered
queries therefore always ``.cast('string')`` date outputs on both sides.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import numpy as np
import pandas as pd

from pyspark_coding_challenge_spark.schemas import TESTDATA_TABLES as TABLES


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
        if math.isnan(f):
            return None
        f = round(f, 6)
        return 0.0 if f == 0.0 else f  # canonicalize -0.0: repr-sort pairing
    if isinstance(v, np.bool_):
        return bool(v)
    if v is pd.NaT:  # DuckDB NULL date/timestamp; Spark side yields None
        return None
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
    try:
        oracle_pdf = con.sql(sql).df()
    finally:
        con.close()
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
