"""Oracle-SQL (DuckDB) twins of the deterministic aggregation helpers."""

from __future__ import annotations


def dsum_sql(expr: str, alias: str | None = None) -> str:
    s = f"CAST(SUM(CAST(ROUND({expr}, 6) AS DECIMAL(18,6))) AS DOUBLE)"
    return f"{s} AS {alias}" if alias else s


def davg_sql(expr: str, alias: str | None = None) -> str:
    s = (
        f"CAST(SUM(CAST(ROUND({expr}, 6) AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
    return f"{s} AS {alias}" if alias else s
