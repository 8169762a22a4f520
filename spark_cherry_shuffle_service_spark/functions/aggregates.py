"""Deterministic aggregation helpers (Spark side).

Floating-point sums are order-dependent; Spark's partial aggregation over N
shuffle partitions sums in a different order than a single-threaded oracle.
`dsum` makes SUM exact and order-independent by rounding each row to 6
decimals (per-row double ops are IEEE-identical across engines) and summing
in DECIMAL — so results are bit-identical at any parallelism, from local[1]
to a 1000-executor cluster. The DECIMAL path stays inside whole-stage
codegen (no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

_DEC = DecimalType(18, 6)


def money(col: Column) -> Column:
    """Exact per-row decimal view of a ~2-dp money/ratio double column."""
    return F.round(col, 6).cast(_DEC)


def dsum(expr: Column, alias: str) -> Column:
    """Order-independent SUM of a double expression → DOUBLE.

    Oracle-side twin: plans/oracle.py::dsum_sql.
    """
    return F.sum(money(expr)).cast("double").alias(alias)


def davg(expr: Column, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in double."""
    return (F.sum(money(expr)).cast("double") / F.count(expr)).alias(alias)
