"""Exact-money expression helpers — THE cents rounding rule.

Double summation is order-dependent across engines, so every oracle-checked
money aggregate first converts to exact integer cents with this one
expression. Centralized because the rounding mode is a cross-engine parity
contract (Spark ``round`` HALF_UP on doubles must keep matching the DuckDB
``ROUND`` the oracles embed): one definition, every call site moves
together.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: str | Column) -> Column:
    """Exact integer cents of a 2-decimal money double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")
