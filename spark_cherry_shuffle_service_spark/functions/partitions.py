"""Tier-(c) custom operators: raw mapPartitions (SURVEY.md §2.11; the
build-plan's last-resort tier after built-ins and Arrow UDFs). Kept to ONE
demonstrative op — per-partition imperative logic that genuinely wants an
iterator: a bounded-memory per-partition top-k heap, merged driver-free by
a final repartition(1) pass over ≤ k·num_partitions survivors.

Prefer the declarative form (`orderBy(...).limit(k)` lowers to
TakeOrderedAndProject) — this exists to prove the escape hatch works and to
document its cost: pickling row iterators through a Python worker, no
codegen, no columnar batching. The 100 TB guidance stands: if you can say
it in DataFrame ops, do.
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame


def partition_topk(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact global top-k by `col` via per-partition heaps.

    Equivalent to df.orderBy(col desc).limit(k); shuffles only k rows per
    input partition instead of range-partitioning the whole input.
    """
    schema = df.schema
    idx = schema.fieldNames().index(col)

    def local_topk(it):
        return iter(heapq.nlargest(k, it, key=lambda row: row[idx]))

    survivors = df.rdd.mapPartitions(local_topk)
    merged = survivors.coalesce(1).mapPartitions(local_topk)
    return df.sparkSession.createDataFrame(merged, schema)
