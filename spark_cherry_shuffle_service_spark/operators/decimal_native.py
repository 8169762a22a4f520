"""DECIMAL-native money semantics.

The reference deliberately keeps DecimalType for all money columns
(tpc-ds-gen/TPCDSPreparation.scala:14-15 `useDoubleForDecimal=false`,
TPCDSBase.scala:58-63) and its q2 divides decimal aggregates with
`round(ws/ss, 2)` — decimal scale promotion in division is SURVEY §7.3's
named hard part. These queries cast money columns to DECIMAL at the scan
and keep EVERY intermediate decimal:

- SUM over DECIMAL is exact and order-independent at any parallelism, so
  none of the dsum/davg double-determinism machinery is needed — the
  decimal path is the reference's answer to the same cross-engine
  determinism problem dsum solves for doubles.
- Division: Spark promotes DECIMAL(p1,s1)/DECIMAL(p2,s2) to scale
  >= 6 (shrinking under allowPrecisionLoss when p overflows 38); DuckDB
  converts decimal division to DOUBLE. Both engines agree after
  ROUND(..., 2) + explicit CAST to the declared output type, which is how
  the q2 shape pins its result scale too.

Output columns carry explicit DECIMAL casts on BOTH engines so the
driver's type-sensitive hash sees identical Arrow decimal128 types (these
specs are tagged `decimal-native`, which flips the Arrow-schema guard in
tests/test_oracle_parity.py from "no decimals" to "must be decimal").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from spark_cherry_shuffle_service_spark.plans.registry import query
from spark_cherry_shuffle_service_spark.sources.catalog import table

_PRICE = DecimalType(15, 2)


@query(
    "decimal_pricing",
    oracle="""
    WITH d AS (
      SELECT l_returnflag, l_linestatus,
             CAST(l_extendedprice AS DECIMAL(15,2)) AS price,
             CAST(l_discount AS DECIMAL(15,2)) AS disc
      FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(price) AS DECIMAL(18,2)) AS gross_dec,
           CAST(SUM(price * (CAST(1 AS DECIMAL(3,2)) - disc)) AS DECIMAL(18,4)) AS net_dec,
           CAST(ROUND(CAST(SUM(price * (CAST(1 AS DECIMAL(3,2)) - disc)) AS DECIMAL(18,4))
                / CAST(SUM(price) AS DECIMAL(18,2)), 2) AS DECIMAL(8,2)) AS net_ratio,
           CAST(ROUND(CAST(SUM(price) AS DECIMAL(18,2)) / COUNT(*), 2) AS DECIMAL(12,2))
             AS avg_price_dec
    FROM d GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "decimal", "decimal-native"),
)
def decimal_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q2-shaped decimal arithmetic: decimal sums, decimal-by-decimal
    and decimal-by-count division, ROUND to a pinned output scale."""
    d = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_extendedprice").cast(_PRICE).alias("price"),
            F.col("l_discount").cast(_PRICE).alias("disc"),
        )
    )
    one = F.lit(1).cast(DecimalType(3, 2))
    agg = d.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("price").alias("gross_raw"),
        F.sum(F.col("price") * (one - F.col("disc"))).alias("net_raw"),
        F.count(F.lit(1)).alias("n"),
    )
    gross = F.col("gross_raw").cast(DecimalType(18, 2))
    net = F.col("net_raw").cast(DecimalType(18, 4))
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        gross.alias("gross_dec"),
        net.alias("net_dec"),
        F.round(net / gross, 2).cast(DecimalType(8, 2)).alias("net_ratio"),
        F.round(gross / F.col("n"), 2).cast(DecimalType(12, 2)).alias("avg_price_dec"),
    )


@query(
    "decimal_priority_share",
    oracle="""
    WITH o AS (
      SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(15,2)) AS price
      FROM orders
    ), tot AS (
      SELECT CAST(SUM(price) AS DECIMAL(20,2)) AS grand FROM o
    )
    SELECT o_orderpriority,
           CAST(SUM(price) AS DECIMAL(18,2)) AS priority_total,
           CAST(ROUND(CAST(SUM(price) AS DECIMAL(18,2)) / (SELECT grand FROM tot), 4)
                AS DECIMAL(8,4)) AS share
    FROM o GROUP BY o_orderpriority
    """,
    tags=("agg", "decimal", "decimal-native", "subquery"),
)
def decimal_priority_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-grand-total over decimal sums: the cross-aggregate decimal
    division variant (grand total is a 1-row SF-invariant scalar — safe to
    broadcast per SCALE.md policy)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority", F.col("o_totalprice").cast(_PRICE).alias("price")
    )
    per = o.groupBy("o_orderpriority").agg(
        F.sum("price").cast(DecimalType(18, 2)).alias("priority_total")
    )
    tot = o.agg(F.sum("price").cast(DecimalType(20, 2)).alias("grand"))
    return per.join(F.broadcast(tot)).select(
        "o_orderpriority",
        "priority_total",
        F.round(F.col("priority_total") / F.col("grand"), 4)
        .cast(DecimalType(8, 4))
        .alias("share"),
    )
