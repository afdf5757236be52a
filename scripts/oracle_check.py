#!/usr/bin/env python
"""Local replica of the driver's CORRECTNESS gate.

Runs every slug in ``registry.queries()`` against its ``oracle_sql()`` DuckDB
twin at sf0.01 and compares row-count / column-set / order-insensitive value
hash, canonicalizing the same way the driver does (pandas ``sort_values`` over
all columns — which CRASHES on list-valued cells, exactly the r1 failure mode,
so any non-scalar output column fails here before it fails at the driver).

Usage: python scripts/oracle_check.py [slug ...]
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd

# runnable from any cwd: the package is not pip-installed
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    # Stringify timestamps/dates so Spark datetime64 and DuckDB object cells
    # compare equal; round floats to absorb summation-order noise.
    out = {}
    for c in cols:
        s = pdf[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype(str)
        else:
            out[c] = s
    pdf = pd.DataFrame(out)
    # Driver-faithful: sort_values over every column (raises TypeError on
    # unhashable cells -> the slug would be red at the driver too).
    return pdf.sort_values(by=cols, kind="mergesort").reset_index(drop=True)


def main() -> int:
    only = set(sys.argv[1:])

    from pyspark_coding_challenge_spark import registry
    from pyspark_coding_challenge_spark.session import get_spark
    from tests.oracle import duck_con  # single source for the view set

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duck_con(SF_DIR)

    qs, oracles = registry.queries(), registry.oracle_sql()
    failures = []
    # a typo'd slug must be a FAILURE, not a silent 0-comparison green
    unknown = only - set(qs)
    for slug in sorted(unknown):
        failures.append(slug)
        print(f"FAIL  {slug}: not a registered slug")
    for slug, fn in qs.items():
        if only and slug not in only:
            continue
        t0 = time.perf_counter()
        try:
            spark_pdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(slug)
            print(f"FAIL  {slug}: spark error: {e}")
            continue
        if slug not in oracles:
            print(f"ROWS  {slug}: {len(spark_pdf)} rows (no oracle — rows-only check)"
                  f"  [{time.perf_counter()-t0:.1f}s]")
            continue
        try:
            oracle_pdf = con.sql(oracles[slug]).df()
        except Exception as e:
            failures.append(slug)
            print(f"FAIL  {slug}: oracle error: {e}")
            continue
        try:
            s, o = _canon(spark_pdf), _canon(oracle_pdf)
        except TypeError as e:
            failures.append(slug)
            print(f"FAIL  {slug}: canonicalizer crash (unhashable output?): {e}")
            continue
        if sorted(s.columns) != sorted(o.columns):
            failures.append(slug)
            print(f"FAIL  {slug}: columns spark={sorted(s.columns)} oracle={sorted(o.columns)}")
            continue
        if len(s) != len(o):
            failures.append(slug)
            print(f"FAIL  {slug}: rows spark={len(s)} oracle={len(o)}")
            continue
        # VALUE-level comparison (like the driver's hash), not dtype-strict
        # DataFrame.equals: DuckDB HUGEINT sums land as float64 where Spark
        # has int64 — equal values must pass, so compare elementwise after
        # the canonicalization above.
        neq = (s != o) & ~(s.isna() & o.isna())
        bad = neq.any(axis=1)
        if bad.any():
            failures.append(slug)
            print(f"FAIL  {slug}: {int(bad.sum())} mismatched rows; first:")
            idx = bad[bad].index[:3]
            for i in idx:
                print(f"  spark : {s.loc[i].to_dict()}")
                print(f"  oracle: {o.loc[i].to_dict()}")
            continue
        print(f"OK    {slug}: {len(s)} rows hash-match  [{time.perf_counter()-t0:.1f}s]")

    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
