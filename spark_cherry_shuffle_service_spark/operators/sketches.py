"""Bounded-memory stream summaries: Misra–Gries heavy hitters.

The reference's skewed workload (skewed_synthetic_workload.py:28) motivates
the hot-key problem; its engine-level answer is shuffle-service plumbing
(SURVEY.md §2.12). The *query-level* answer at 100 TB is to avoid shipping
the full key domain through a shuffle at all when only the heavy tail
matters: a two-pass exact heavy-hitters operator.

  Pass 1 (candidates): each input partition folds its key stream through a
    Misra–Gries summary with `capacity` counters (Arrow-batched
    mapInPandas; memory O(capacity + arrow_batch_distinct), never
    O(distinct keys)). Batches are merged with the Mergeable-Summaries
    rule (Agarwal et al., PODS'12): pointwise add, then subtract the
    (capacity+1)-th largest count and drop non-positive counters. The
    summary's undercount is at most n_p/(capacity+1), so every key with
    GLOBAL count > n/k (k <= capacity) survives in at least one
    partition's summary — recall is guaranteed, for any partitioning.
  Pass 2 (verify): exact counts for the candidate union only — the scan
    streams through a join against the bounded candidate set (at most
    partitions x capacity rows; AQE broadcasts it at any realistic size),
    so the only aggregation shuffle carries candidate keys, not the
    domain. False candidates are filtered by the exact threshold, making
    the final result EXACT and partitioning-independent — which is what
    lets a plain GROUP BY/HAVING SQL oracle adjudicate it.

Scale: the full-domain groupBy this replaces shuffles O(distinct keys)
partials per map task; this plan shuffles O(capacity) per map task
regardless of domain size. Total-count is a separate scalar scan (at
100 TB you would fuse it into pass 2 with df.observe()).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from spark_cherry_shuffle_service_spark.plans.registry import query
from spark_cherry_shuffle_service_spark.sources.catalog import table

_CAND_SCHEMA = StructType([StructField("key", LongType())])


def _mg_merge(
    counters: dict[int, int], batch_sums: pd.Series, capacity: int
) -> dict[int, int]:
    """Merge one Arrow batch's exact per-key sums (a Series indexed by key
    — value_counts for the unweighted case, groupby-sum of a non-negative
    weight otherwise) into a Misra–Gries summary.

    Mergeable-Summaries rule: add, then if more than `capacity` counters
    remain, subtract the (capacity+1)-th largest count from every counter
    and drop the non-positive ones (at most `capacity` strictly-larger
    entries can survive). Cumulative undercount after any merge sequence
    is bounded by W/(capacity+1), W = total weight (= n when weights
    are 1)."""
    for key, add in batch_sums.items():
        counters[key] = counters.get(key, 0) + int(add)
    if len(counters) > capacity:
        cut = sorted(counters.values(), reverse=True)[capacity]
        counters = {k: v - cut for k, v in counters.items() if v > cut}
    return counters


def misra_gries_candidates(df: DataFrame, capacity: int) -> DataFrame:
    """Per-partition Misra–Gries summaries over `df.key` (long) weighted by
    `df.w` (non-negative long), unioned.

    Output is a superset of every key with global weight > W/(capacity+1);
    it may contain false positives and DEPENDS on the partitioning — always
    follow with an exact verify pass (heavy_hitters_exact) before using
    the result."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[int, int] = {}
        for pdf in batches:
            if (pdf["w"] < 0).any():
                raise ValueError("Misra–Gries requires non-negative weights")
            counters = _mg_merge(counters, pdf.groupby("key")["w"].sum(), capacity)
        yield pd.DataFrame({"key": pd.Series(sorted(counters), dtype="int64")})

    return df.select("key", "w").mapInPandas(fold, _CAND_SCHEMA)


def heavy_hitters_exact(
    df: DataFrame,
    k: int,
    capacity: int | None = None,
    mg_partitions: int | None = None,
    weight: str | None = None,
) -> DataFrame:
    """Exact heavy hitters: every key of `df.key` whose total weight w
    satisfies w*k > W (total weight). With `weight=None` every row weighs
    1, i.e. frequency heavy hitters; otherwise `weight` names a
    non-negative integer column (mass heavy hitters — revenue, bytes,
    token counts — same MG guarantee, weights just replace counts).

    Two passes over the input (candidates, verify) plus a scalar total —
    never a full-domain shuffle. `capacity` >= k is required for the
    recall guarantee; the default 4*k keeps a comfortable margin between
    the summary error bound W/(capacity+1) and the report threshold W/k.

    `mg_partitions` repartitions ONLY the Misra–Gries input (the one
    CPU-heavy, Python-side pass — the single-file-fixture gotcha). The
    verify pass and the scalar total are plain JVM sums and read the
    source as-is: routing them through the same repartition would add
    two full-row exchanges that buy nothing (caught by a formatted-plan
    audit; at 100 TB those are the two biggest shuffles in the query).
    """
    capacity = 4 * k if capacity is None else capacity
    if capacity < k:
        raise ValueError(f"capacity {capacity} < k {k} breaks the MG recall guarantee")
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    work = df.select("key", w.alias("w"))
    mg_in = work.repartition(mg_partitions) if mg_partitions else work
    cands = misra_gries_candidates(mg_in, capacity).distinct()
    total = work.agg(F.sum("w").alias("n"))  # 1-row scalar: broadcast-safe
    exact = work.join(cands, "key").groupBy("key").agg(F.sum("w").alias("cnt"))
    return exact.crossJoin(total).filter(F.col("cnt") * k > F.col("n")).select("key", "cnt")


_HH_K = 50
_HH_KEY_SQL = (
    "CASE WHEN l_orderkey % 1000 < 300 THEN l_orderkey % 8 ELSE 100 + l_orderkey END"
)


@query(
    "heavy_hitters_mg",
    oracle=f"""
    WITH keyed AS (
      SELECT {_HH_KEY_SQL} AS key FROM lineitem
    ), tot AS (SELECT COUNT(*) AS n FROM keyed)
    SELECT key, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM keyed GROUP BY key
    HAVING COUNT(*) * {_HH_K} > (SELECT n FROM tot)
    """,
    tags=("sketch", "skew", "scale", "mapInPandas"),
    doc="Exact heavy hitters via Misra–Gries candidates + verify pass: the "
    "bounded-shuffle substitute for a full-domain GROUP BY when only keys "
    "above an n/k frequency threshold matter.",
)
def heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keys holding > 1/50 of all lineitem rows under the skewed-workload
    key map (8 hot keys at ~3.7% each over a tail of one key per order —
    ~100k distinct at sf0.1, so the capacity-200 summaries evict
    constantly while the hot keys ride well above the n/201 error bound).
    The MG candidate set varies with partitioning; the verified output is
    exact and partition-invariant (tests/test_sketches.py proves both).
    Reference semantics anchor: skewed_synthetic_workload.py:28."""
    par = spark.sparkContext.defaultParallelism
    key = F.when(
        F.col("l_orderkey") % 1000 < 300, (F.col("l_orderkey") % 8).cast("long")
    ).otherwise(100 + F.col("l_orderkey"))
    keyed = table(spark, sf_dir, "lineitem").select(key.alias("key"))
    # mg_partitions spreads only the Python MG pass (single-file fixture
    # scans as ONE partition); verify/total read the scan directly.
    return heavy_hitters_exact(keyed, k=_HH_K, capacity=200, mg_partitions=par)


@query(
    "heavy_hitters_weighted",
    oracle=f"""
    WITH keyed AS (
      SELECT {_HH_KEY_SQL} AS key, CAST(l_quantity AS BIGINT) AS w FROM lineitem
    ), tot AS (SELECT SUM(w) AS n FROM keyed)
    SELECT key, CAST(SUM(w) AS BIGINT) AS cnt
    FROM keyed GROUP BY key
    HAVING SUM(w) * {_HH_K} > (SELECT n FROM tot)
    """,
    tags=("sketch", "skew", "scale", "mapInPandas", "weighted"),
    doc="Mass (weighted) heavy hitters: keys carrying > 1/50 of total "
    "l_quantity under the skewed key map — the same MG candidates + exact "
    "verify two-pass, with per-row weights replacing counts.",
)
def heavy_hitters_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted twin of heavy_hitters_mg: which keys carry >2% of total
    quantity MASS (not row count)? Weights are integral fixture doubles
    cast to BIGINT (exact in both engines); the MG merge sums weights per
    batch, and the undercount bound becomes W/(capacity+1). Everything
    else — recall guarantee, exact verify, partition invariance — carries
    over verbatim."""
    par = spark.sparkContext.defaultParallelism
    key = F.when(
        F.col("l_orderkey") % 1000 < 300, (F.col("l_orderkey") % 8).cast("long")
    ).otherwise(100 + F.col("l_orderkey"))
    keyed = table(spark, sf_dir, "lineitem").select(key.alias("key"), "l_quantity")
    return heavy_hitters_exact(
        keyed, k=_HH_K, capacity=200, mg_partitions=par, weight="l_quantity"
    )
