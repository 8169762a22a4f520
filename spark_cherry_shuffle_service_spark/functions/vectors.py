"""Vector column expressions over array<float> embeddings.

All folds are strictly sequential left-folds (F.aggregate), matching the
DuckDB oracle's list_reduce — so double-precision results are bit-identical
across engines and across cluster sizes (per-row ops never depend on
partitioning). JVM-side only; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, sequential fold.

    Oracle twin: list_reduce(list_prepend(0.0, list_transform(
      list_zip(a, b), z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))),
      (x, y) -> x + y)
    """
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
