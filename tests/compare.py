"""Differential-comparison harness mirroring the driver's t2 check:
row count + schema (sorted column names) + order-insensitive values.

Values are compared EXACTLY (not approximately): the engine's aggregation
convention (ROUND→DECIMAL→SUM→DOUBLE, see plans/registry.py) is designed
to make Spark and DuckDB bit-identical, so any mismatch here is a real
portability bug that would also fail the driver's value-hash."""

from __future__ import annotations

import datetime
import math
from typing import Any

from pyspark.sql import DataFrame


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    # Decimal, ints, strings, bools pass through
    return v


def spark_rows(df: DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(rows, key=repr)


def duck_rows(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    rows = [tuple(_norm_cell(row[i]) for i in order) for row in cur.fetchall()]
    return cols, sorted(rows, key=repr)


def assert_matches_oracle(df: DataFrame, con, sql: str, name: str = "") -> None:
    s_cols, s_rows = spark_rows(df)
    d_cols, d_rows = duck_rows(con, sql)
    assert s_cols == d_cols, f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        assert sr == dr, f"{name}: row {i} differs\n spark={sr}\n  duck={dr}"
