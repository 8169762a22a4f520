"""Deterministic aggregation helpers (Spark side).

Floating-point sums are order-dependent; Spark's partial aggregation over N
shuffle partitions sums in a different order than a single-threaded oracle.
`dsum` makes SUM exact and order-independent by rounding each row to 6
decimals (per-row double ops are IEEE-identical across engines) and summing
in DECIMAL — so results are bit-identical at any parallelism, from local[1]
to a 1000-executor cluster. The DECIMAL path stays inside whole-stage
codegen (no Python).

DECIMAL→DOUBLE (the r7 fix, found by the generated ~sf1 differential):
once a scale-6 decimal's integer micro-value exceeds 2^53 (sum ≥ ~9.0e9),
the nearest double is no longer exact and ENGINES DISAGREE by 1 ulp on the
conversion itself (Spark routes through Java BigDecimal.doubleValue();
DuckDB through int128 scaling — a double-rounding path). sf0.1 money sums
peak at ~3.3e9, so every fixture-scale test passed; at sf1 the same
queries drifted (pricing_summary, abc_classification). The fix converts
via an integer/fraction SPLIT: int64→double and double/1e6 and double
addition are each single correctly-rounded IEEE ops that both engines
execute identically, so the result is bit-identical by construction at any
magnitude up to 2^63 whole units (±9.2e18 — beyond any 100 TB money sum).
Twin: plans/oracle.py::dec_to_double_sql (kept expression-identical).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

_DEC = DecimalType(18, 6)


def money(col: Column) -> Column:
    """Exact per-row decimal view of a ~2-dp money/ratio double column."""
    return F.round(col, 6).cast(_DEC)


def dec_to_double(s: Column) -> Column:
    """Engine-identical DECIMAL(p,6)→DOUBLE via integer/fraction split.

    floor(s) is exact in decimal; (s-floor(s))*1e6 is an exact integer in
    [0, 1e6). Each remaining step (int64→double, double/1e6, double+double)
    is one correctly-rounded IEEE-754 op — no engine-specific decimal
    scaling path — so Spark and DuckDB produce the same bits even when the
    decimal needs more than 53 significand bits."""
    ip = F.floor(s)
    frac = (s - ip) * F.lit(1_000_000)
    return ip.cast("long").cast("double") + frac.cast("long").cast("double") / F.lit(1_000_000.0)


def dsum(expr: Column, alias: str) -> Column:
    """Order-independent SUM of a double expression → DOUBLE.

    Oracle-side twin: plans/oracle.py::dsum_sql.
    """
    return dec_to_double(F.sum(money(expr))).alias(alias)


def davg(expr: Column, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in double."""
    return (dec_to_double(F.sum(money(expr))) / F.count(expr)).alias(alias)
