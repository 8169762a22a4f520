"""Storage-layout operators: Z-order (Morton) multi-dimensional clustering.

The reference pre-clusters fact tables on partition columns at generation
time (`clusterByPartitionColumns=true`, tpc-ds-gen/TPCDSPreparation.scala:
17-25) — one-dimensional clustering: great min/max row-group stats on ONE
key, useless on a second. At 100 TB the classic fix is a space-filling
curve: bucket each dimension, interleave the bucket bits into a Morton
(Z-order) key, and sort the write by it. Every run of z-values then covers
a bounded rectangle in (dim1, dim2) space, so parquet row-group min/max
stats prune reads filtered on EITHER dimension — the technique behind
Delta/Iceberg `ZORDER BY`, built here from plain Spark expressions.

Everything is JVM-side codegen arithmetic (shift/and/add — no UDFs, no
shuffle beyond the final range-sort at write time). The z-value is exact
integer math, identical in Spark and DuckDB, so the block-statistics query
is differentially testable.

Scale notes (100 TB): computing z is a per-row projection (free at scan).
The clustering write is one range-sort — the same shuffle a 1-D clustered
write already pays; repartitionByRange on z bounds file count and gives
near-uniform output files. Dimension bucketing uses the column max from a
1-row scalar aggregate (broadcast — SF-invariant row count, CLAUDE.md
broadcast policy). For truly unbounded domains swap max-scaling for a
fixed-width hash bucket; the interleave is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_cherry_shuffle_service_spark.plans.registry import query
from spark_cherry_shuffle_service_spark.sources.catalog import table

#: bits per dimension: 256 buckets/dim → 16-bit z-values.
ZBITS = 8


def zorder_value(xb: Column, yb: Column, bits: int = ZBITS) -> Column:
    """Interleave two `bits`-wide bucket ids into a Morton key.

    z = Σ_i ((xb>>i)&1)<<2i | ((yb>>i)&1)<<(2i+1) — a 2·bits-term sum of
    shift/and terms; scalar bit ops codegen into one whole-stage expression
    (unlike array element_at chains, CLAUDE.md gotcha — no CSE issue here).
    """
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def _zorder_sql(xb: str, yb: str, bits: int = ZBITS) -> str:
    """DuckDB twin of zorder_value (same integer math, operator syntax)."""
    return " + ".join(
        f"((({xb} >> {i}) & 1) << {2 * i}) + ((({yb} >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )


def zorder_bucketed(df: DataFrame, xcol: str, ycol: str, bits: int = ZBITS) -> DataFrame:
    """Add xb/yb (max-scaled bucket ids) and zval columns. Pure-integer
    bucketing `(x * 2^bits) div (max+1)` — exact on both engines, unlike
    float FLOOR division."""
    n = 1 << bits
    m = df.agg(
        F.max(F.col(xcol)).cast("long").alias("__xmax"),
        F.max(F.col(ycol)).cast("long").alias("__ymax"),
    )
    # 1-row scalar aggregate: explicitly broadcastable (CLAUDE.md policy).
    b = df.join(F.broadcast(m)).select(
        df["*"],
        F.expr(f"(CAST({xcol} AS BIGINT) * {n}) div (__xmax + 1)").alias("xb"),
        F.expr(f"(CAST({ycol} AS BIGINT) * {n}) div (__ymax + 1)").alias("yb"),
    )
    return b.withColumn("zval", zorder_value(F.col("xb"), F.col("yb"), bits))


def write_zordered(
    df: DataFrame, path: str, xcol: str, ycol: str, bits: int = ZBITS, n_files: int = 8
) -> None:
    """Z-order-clustered parquet write: bucket, Morton-interleave, range-
    partition + sort by zval so every output file (and row group) covers a
    bounded (xcol, ycol) rectangle → min/max stats prune on either column."""
    z = zorder_bucketed(df, xcol, ycol, bits)
    (
        z.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("xb", "yb", "zval", "__xmax", "__ymax")
        .write.mode("overwrite")
        .parquet(path)
    )


@query(
    "zorder_block_stats",
    oracle=f"""
    WITH m AS (
      SELECT CAST(MAX(l_partkey) AS BIGINT) AS xmax,
             CAST(MAX(l_suppkey) AS BIGINT) AS ymax
      FROM lineitem
    ), b AS (
      SELECT (CAST(l_partkey AS BIGINT) * 256) // (xmax + 1) AS xb,
             (CAST(l_suppkey AS BIGINT) * 256) // (ymax + 1) AS yb
      FROM lineitem, m
    ), z AS (
      SELECT xb, yb, {_zorder_sql('xb', 'yb')} AS zval FROM b
    )
    SELECT CAST(zval >> 8 AS BIGINT) AS zblock,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(xb) AS BIGINT) AS x_min, CAST(MAX(xb) AS BIGINT) AS x_max,
           CAST(MIN(yb) AS BIGINT) AS y_min, CAST(MAX(yb) AS BIGINT) AS y_max
    FROM z
    GROUP BY zblock
    """,
    tags=("layout", "zorder", "data-skipping"),
)
def zorder_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-z-block locality statistics over lineitem's (partkey, suppkey):
    each 256-z-value block must span a bounded square in bucket space —
    the property that makes z-sorted row-group stats prunable on both
    dimensions. The differential oracle verifies the interleave math
    bit-for-bit; tests/test_layout.py verifies the file-level pruning
    effect of write_zordered."""
    z = zorder_bucketed(table(spark, sf_dir, "lineitem"), "l_partkey", "l_suppkey")
    return z.groupBy(F.shiftright(F.col("zval"), 8).cast("long").alias("zblock")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("xb").cast("long").alias("x_min"),
        F.max("xb").cast("long").alias("x_max"),
        F.min("yb").cast("long").alias("y_min"),
        F.max("yb").cast("long").alias("y_max"),
    )
