"""Oracle-SQL (DuckDB) twins of the deterministic aggregation helpers.

Each twin mirrors functions/aggregates.py op-for-op — including the
integer/fraction split DECIMAL→DOUBLE conversion (see the module docstring
there): naive CAST(DECIMAL AS DOUBLE) disagrees between engines by 1 ulp
once the sum exceeds ~9.0e9 (first observed at the generated ~sf1 scale on
pricing_summary / abc_classification)."""

from __future__ import annotations


def dec_to_double_sql(s: str) -> str:
    """Engine-identical DECIMAL→DOUBLE: twin of aggregates.dec_to_double.
    FLOOR(DECIMAL) stays DECIMAL in DuckDB, so every step before the
    int64→double casts is exact."""
    return (
        f"(CAST(CAST(FLOOR({s}) AS BIGINT) AS DOUBLE)"
        f" + CAST(CAST(({s} - FLOOR({s})) * 1000000 AS BIGINT) AS DOUBLE)"
        f" / CAST(1000000 AS DOUBLE))"
    )


def _dsum_dec(expr: str) -> str:
    return f"SUM(CAST(ROUND({expr}, 6) AS DECIMAL(18,6)))"


def dsum_sql(expr: str, alias: str | None = None) -> str:
    s = dec_to_double_sql(_dsum_dec(expr))
    return f"{s} AS {alias}" if alias else s


def davg_sql(expr: str, alias: str | None = None) -> str:
    s = f"{dec_to_double_sql(_dsum_dec(expr))} / COUNT({expr})"
    return f"{s} AS {alias}" if alias else s
