"""Workload parity: the reference's two PySpark RDD shuffle workloads.

The reference's `synthetic_workload.py:24-35` builds (key, 100-char value)
pairs with key = id % partitions, then `groupByKey().mapValues(len)` — i.e.
a keyed count; `skewed_synthetic_workload.py:28` maps a fraction k of all
rows to key 1. Re-expressed as DataFrames (SURVEY.md §1.3): a single
map-side-combined shuffle with no Python workers and no per-key
materialization — `groupByKey` in the reference ships every value through
the shuffle; `groupBy().count()` ships one partial count per key per map
partition, which is the whole point at 100 TB.

Oracle-checkable variants run the same keyed count over `lineitem`
(key = l_orderkey % p — FIXTURES.md); generator-based variants
(spark.range) match the reference's data shape exactly and are used by
bench.py and tests (closed-form expected counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_cherry_shuffle_service_spark.functions.aggregates import dec_to_double
from spark_cherry_shuffle_service_spark.plans.oracle import dec_to_double_sql, dsum_sql
from spark_cherry_shuffle_service_spark.plans.registry import query
from spark_cherry_shuffle_service_spark.sources.catalog import table


# ---------------------------------------------------------------------------
# synthetic_workload.py:27-35 semantics over the lineitem fixture:
# key = l_orderkey % p → count per key.
# ---------------------------------------------------------------------------
@query(
    "synthetic_groupcount",
    oracle="""
    SELECT l_orderkey % 100 AS key, COUNT(*) AS n
    FROM lineitem
    GROUP BY l_orderkey % 100
    """,
    tags=("workload", "groupby"),
)
def synthetic_groupcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy((F.col("l_orderkey") % 100).alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# skewed_synthetic_workload.py:28 semantics: fraction k of rows forced onto
# key 1 (here k≈0.8 via modulo bucket), rest spread by id % p. AQE +
# map-side partial aggregation absorb the hot key (SURVEY.md §2.12).
# ---------------------------------------------------------------------------
@query(
    "skewed_groupcount",
    oracle="""
    SELECT CASE WHEN l_orderkey % 10 < 8 THEN 1 ELSE l_orderkey % 100 END AS key,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CASE WHEN l_orderkey % 10 < 8 THEN 1 ELSE l_orderkey % 100 END
    """,
    tags=("workload", "groupby", "skew"),
)
def skewed_groupcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = F.when(F.col("l_orderkey") % 10 < 8, F.lit(1).cast("long")).otherwise(
        F.col("l_orderkey") % 100
    )
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy(key.alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Generator-based exact replicas (no fixture input): used by tests (closed
# form) and bench.py. Value column reproduces the reference's 100-char ASCII
# payload deterministically (seeded via key-derived md5 chain, not
# random.choice, so results are reproducible).
# ---------------------------------------------------------------------------
def synthetic_pairs(spark: SparkSession, n_rows: int, partitions: int) -> DataFrame:
    """(key, value) pairs per synthetic_workload.py:26-28."""
    payload = F.concat(*[F.md5(F.concat(F.col("id").cast("string"), F.lit(f"#{i}"))) for i in range(4)])
    return spark.range(1 + partitions, n_rows + 1 + partitions, 1, partitions).select(
        (F.col("id") % partitions).alias("key"),
        F.substring(payload, 1, 100).alias("value"),
    )


def skewed_pairs(spark: SparkSession, n_rows: int, partitions: int, k: float) -> DataFrame:
    """skewed_synthetic_workload.py:28: first k·n rows on key 1."""
    threshold = int(k * n_rows) + partitions + 1  # ids start at 1+partitions
    payload = F.concat(*[F.md5(F.concat(F.col("id").cast("string"), F.lit(f"#{i}"))) for i in range(4)])
    return spark.range(1 + partitions, n_rows + 1 + partitions, 1, partitions).select(
        F.when(F.col("id") < threshold, F.lit(1).cast("long"))
        .otherwise(F.col("id") % partitions)
        .alias("key"),
        F.substring(payload, 1, 100).alias("value"),
    )


def group_count(pairs: DataFrame) -> DataFrame:
    """groupByKey().mapValues(len) ≡ keyed count (synthetic_workload.py:33-35)."""
    return pairs.groupBy("key").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Salted two-phase aggregation: the explicit skew-mitigation path for when
# partial aggregation isn't enough (e.g. the aggregate must see raw values —
# collect_list, exact distinct — so map-side combine can't shrink the hot
# key). Phase 1 shards each key across `salt` sub-keys and pre-aggregates;
# phase 2 merges the ≤salt partials per key. The hot key's shuffle load drops
# from |rows| on one reducer to |rows|/salt on each of `salt` reducers.
# ---------------------------------------------------------------------------
def salted_group_count(pairs: DataFrame, salt: int = 16) -> DataFrame:
    """Two-phase keyed count equal to group_count() for any input."""
    phase1 = (
        pairs.withColumn("_salt", F.pmod(F.xxhash64("key", F.monotonically_increasing_id()), F.lit(salt)))
        .groupBy("key", "_salt")
        .agg(F.count(F.lit(1)).alias("pn"))
    )
    return phase1.groupBy("key").agg(F.sum("pn").cast("long").alias("n"))


@query(
    "skewed_salted_groupcount",
    oracle="""
    SELECT CASE WHEN l_orderkey % 10 < 8 THEN 1 ELSE l_orderkey % 100 END AS key,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CASE WHEN l_orderkey % 10 < 8 THEN 1 ELSE l_orderkey % 100 END
    """,
    tags=("workload", "groupby", "skew", "salt", "scale"),
)
def skewed_salted_groupcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as skewed_groupcount, computed via the salted two-phase
    plan — differential proof that salting is semantics-preserving."""
    key = F.when(F.col("l_orderkey") % 10 < 8, F.lit(1).cast("long")).otherwise(
        F.col("l_orderkey") % 100
    )
    pairs = table(spark, sf_dir, "lineitem").select(key.alias("key"))
    return salted_group_count(pairs, salt=16)


# ---------------------------------------------------------------------------
# Salted SHUFFLE JOIN: the join-side twin of salted_group_count. When the
# probe side has a hot key and the build side is too big to broadcast, a
# plain shuffle join lands every hot-key row on ONE reducer. Salting shards
# the probe side into `salt` sub-keys and replicates each build row `salt`
# times (explode over the salt range), so the hot key spreads across `salt`
# reducers. Result is provably identical to the unsalted join (the oracle
# runs the plain join). AQE's skew-join split handles this automatically
# when it can (test_aqe_actually_splits_skewed_join); the manual pattern is
# for the cases AQE can't re-plan — e.g. when a downstream stage requires
# the join's partitioning (BASELINE.md gotcha) — and is the 100 TB recipe
# the reference's skewed workload motivates (SURVEY.md §2.12).
# ---------------------------------------------------------------------------
_SKEW_KEY_SQL = "CASE WHEN l_orderkey % 10 < 8 THEN 1 ELSE l_orderkey % 100 END"


@query(
    "skewed_salted_join",
    oracle=f"""
    WITH fact AS (
      SELECT {_SKEW_KEY_SQL} AS key, l_quantity FROM lineitem
    ), dim AS (
      SELECT p_partkey % 100 AS dkey,
             {{dsum}} FROM part GROUP BY p_partkey % 100
    )
    SELECT key, COUNT(*) AS n_rows,
           {{weighted}} AS weighted
    FROM fact JOIN dim ON key = dkey
    GROUP BY key
    """.format(
        dsum=dsum_sql("p_retailprice", "dim_price"),
        weighted=dec_to_double_sql(
            "SUM(CAST(ROUND(dim_price * l_quantity, 6) AS DECIMAL(28,6)))"
        ),
    ),
    tags=("workload", "join", "skew", "salt", "scale"),
)
def skewed_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    SALT = 16
    key = F.when(F.col("l_orderkey") % 10 < 8, F.lit(1).cast("long")).otherwise(
        F.col("l_orderkey") % 100
    )
    # Salt is never part of the result, so any deterministic-per-row spread
    # works; xxhash64 over the row identity is cheapest (stays in codegen).
    fact = table(spark, sf_dir, "lineitem").select(
        key.alias("key"),
        "l_quantity",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT)).alias("fsalt"),
    )
    from spark_cherry_shuffle_service_spark.functions.aggregates import dsum

    dim = (
        table(spark, sf_dir, "part")
        .groupBy((F.col("p_partkey") % 100).alias("dkey"))
        .agg(dsum(F.col("p_retailprice"), "dim_price"))
    )
    # Replicate each build row across the salt range; hint shuffle_hash to
    # model the big-build case where broadcast isn't available.
    dim_salted = dim.withColumn(
        "dsalt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    ).hint("shuffle_hash")
    joined = fact.join(
        dim_salted,
        (fact.key == dim_salted.dkey) & (fact.fsalt == dim_salted.dsalt),
    )
    return joined.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dec_to_double(
            F.sum(F.round(F.col("dim_price") * F.col("l_quantity"), 6).cast("decimal(28,6)"))
        ).alias("weighted"),
    )
