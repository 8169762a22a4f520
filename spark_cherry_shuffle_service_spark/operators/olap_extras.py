"""OLAP operators beyond the reference's exercised surface (SURVEY.md §2.4/§2.5
"Not present" rows): lead/lag, first/last_value, ntile, RANGE frames, CUBE,
GROUPING SETS, exact percentiles. The reference inherits all of these from
Spark SQL unexercised (its TPC-DS corpus stops at rank/row_number + ROLLUP —
SURVEY.md §2.5, tpcds/q67.sql:13, q70.sql:5-9); a complete engine must still
offer them, so each lands here with a DuckDB oracle.

Scale notes: every window below partitions by a bounded-cardinality key
(returnflag, nationkey) so no single window partition exceeds executor
memory; CUBE/GROUPING SETS expand rows by the number of grouping sets
BEFORE the shuffle (Spark's Expand operator), so the shuffle carries
|sets|× the map output — acceptable for ≤4 sets, and partial aggregation
still combines map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_cherry_shuffle_service_spark.functions.aggregates import dec_to_double, dsum, money
from spark_cherry_shuffle_service_spark.functions.ranking import (
    ntile_expr,
    with_global_rank,
    with_global_ranks,
)
from spark_cherry_shuffle_service_spark.plans.oracle import dsum_sql
from spark_cherry_shuffle_service_spark.plans.registry import query
from spark_cherry_shuffle_service_spark.sources.catalog import table

_REV_EXPR = "l_extendedprice * (1 - l_discount)"


# ---------------------------------------------------------------------------
# lead/lag: day-over-day revenue delta per return flag.
# ---------------------------------------------------------------------------
@query(
    "window_lead_lag",
    oracle=f"""
    WITH daily AS (
      SELECT l_returnflag, CAST(l_shipdate AS DATE) AS d,
             {dsum_sql('l_extendedprice', 'rev')}
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1998-02-01' AND DATE '1998-02-28'
      GROUP BY l_returnflag, CAST(l_shipdate AS DATE)
    )
    SELECT l_returnflag, d, rev,
           ROUND(rev - LAG(rev, 1, 0.0) OVER (PARTITION BY l_returnflag ORDER BY d), 4) AS delta_prev,
           ROUND(COALESCE(LEAD(rev) OVER (PARTITION BY l_returnflag ORDER BY d), 0.0), 4) AS next_rev
    FROM daily
    """,
    tags=("window", "lead", "lag"),
)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        table(spark, sf_dir, "lineitem")
        .filter(
            F.to_date("l_shipdate").between(
                F.lit("1998-02-01").cast("date"), F.lit("1998-02-28").cast("date")
            )
        )
        .groupBy("l_returnflag", F.to_date("l_shipdate").alias("d"))
        .agg(dsum(F.col("l_extendedprice"), "rev"))
    )
    w = Window.partitionBy("l_returnflag").orderBy("d")
    return daily.select(
        "l_returnflag",
        "d",
        "rev",
        F.round(F.col("rev") - F.lag("rev", 1, 0.0).over(w), 4).alias("delta_prev"),
        F.round(F.coalesce(F.lead("rev").over(w), F.lit(0.0)), 4).alias("next_rev"),
    )


# ---------------------------------------------------------------------------
# first_value / last_value over a full-partition frame + ntile quartiles.
# ---------------------------------------------------------------------------
@query(
    "window_first_last_ntile",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal,
           FIRST_VALUE(s_suppkey) OVER w AS richest,
           LAST_VALUE(s_suppkey) OVER w AS poorest,
           NTILE(4) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS quartile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "first_value", "ntile"),
)
def window_first_last_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    order = [F.col("s_acctbal").desc(), F.col("s_suppkey")]
    w_full = (
        Window.partitionBy("s_nationkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_tile = Window.partitionBy("s_nationkey").orderBy(*order)
    return table(spark, sf_dir, "supplier").select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.first("s_suppkey").over(w_full).alias("richest"),
        F.last("s_suppkey").over(w_full).alias("poorest"),
        F.ntile(4).over(w_tile).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# RANGE frame on a numeric order key: count of orders within the trailing
# price band of width 10000 per priority (value-based, not row-based frame).
# ---------------------------------------------------------------------------
@query(
    "window_range_frame",
    oracle="""
    WITH o AS (
      SELECT o_orderpriority, ROUND(o_totalprice, 0) AS price FROM orders
      WHERE o_orderkey % 10 = 0
    )
    SELECT o_orderpriority, price,
           COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY price
                          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_in_band
    FROM o
    """,
    tags=("window", "range_frame"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderpriority", F.round("o_totalprice", 0).alias("price"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy("price").rangeBetween(-10000, 0)
    return o.select(
        "o_orderpriority", "price", F.count(F.lit(1)).over(w).alias("n_in_band")
    )


# ---------------------------------------------------------------------------
# CUBE with grouping() labels — completes the ROLLUP family (tpcds/q70.sql's
# grouping() arithmetic, SURVEY.md §2.4, applied to the lattice CUBE builds).
# ---------------------------------------------------------------------------
@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) + GROUPING(l_linestatus) AS agg_level,
           COUNT(*) AS n, {dsum_sql('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube", "grouping"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Partial-agg-under-Expand: Expand multiplies its INPUT by the number of
    # grouping sets (4 here), so cube the finest-grain pre-aggregate, not the
    # fact table — fan-out drops from |lineitem|x4 rows to |rf x ls|x4
    # (~8 groups at any SF). Decimal partial sums re-sum exactly, so results
    # are bit-identical to cubing the raw rows at any parallelism; GROUPING()
    # markers are unchanged because the cube dims are the pre-agg keys.
    base = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(money(F.col("l_quantity"))).alias("_qty_dec"),
        )
    )
    return (
        base.cube("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") + F.grouping("l_linestatus")).alias("agg_level"),
            F.sum("_n").alias("n"),
            dec_to_double(F.sum("_qty_dec")).alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "agg_level", "n", "sum_qty")
    )


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS (DataFrame.groupingSets, Spark 4): per-flag totals,
# per-status totals, and the grand total in one pass over the fact table.
# ---------------------------------------------------------------------------
@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {dsum_sql('l_extendedprice', 'sum_price')}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "grouping_sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same partial-agg-under-Expand rewrite as agg_cube: every requested
    # grain is a rollup of (rf, ls), so Expand fans out the ~8-row pre-agg
    # instead of the fact table. Exact: decimal partials re-sum losslessly.
    base = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(money(F.col("l_extendedprice"))).alias("_price_dec"),
        )
    )
    return (
        base.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
        )
        .agg(
            F.sum("_n").alias("n"),
            dec_to_double(F.sum("_price_dec")).alias("sum_price"),
        )
        .select("l_returnflag", "l_linestatus", "n", "sum_price")
    )


# ---------------------------------------------------------------------------
# Exact percentiles + median per group. Spark `percentile` and DuckDB
# `quantile_cont` both do linear interpolation; l_quantity is integral so
# interpolated values are exact in double; the money median is rounded.
# ---------------------------------------------------------------------------
@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5) AS q50,
           quantile_cont(l_quantity, 0.9) AS q90,
           ROUND(median(l_extendedprice), 4) AS median_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "percentile", "median", "exact-unbounded"),
    scale_twin="agg_percentiles_histogram",
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.25)").alias("q25"),
            F.expr("percentile(l_quantity, 0.5)").alias("q50"),
            F.expr("percentile(l_quantity, 0.9)").alias("q90"),
            F.round(F.expr("median(l_extendedprice)"), 4).alias("median_price"),
        )
    )


# ---------------------------------------------------------------------------
# UDAF via pandas_udf GROUPED_AGG — the reference has NO UDAF mechanism at
# all (SURVEY.md §2.11); this is Spark's: an Arrow-batched grouped
# aggregate (geometric mean of quantity per flag). The JVM twin
# exp(avg(ln x)) doubles as the DuckDB oracle, so the UDAF path itself is
# differentially verified. Python here is the sanctioned Arrow path — one
# batch per group, not per row.
# ---------------------------------------------------------------------------
@query(
    "udaf_grouped_geomean",
    oracle="""
    SELECT l_returnflag,
           ROUND(exp(avg(ln(l_quantity))), 6) AS geomean_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "udaf", "pandas_udf", "mapInPandas"),
)
def udaf_grouped_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _geomean(v):
        return float(np.exp(np.mean(np.log(v.to_numpy(dtype="float64")))))

    # explicit GROUPED_AGG: `from __future__ import annotations` stringifies
    # type hints, so Series→scalar inference can't kick in here.
    geomean = pandas_udf(_geomean, "double", PandasUDFType.GROUPED_AGG)

    return (
        table(spark, sf_dir, "lineitem")
        .repartition(spark.sparkContext.defaultParallelism, "l_orderkey")
        .groupBy("l_returnflag")
        # NB: a grouped-agg pandas UDF cannot be mixed with JVM aggregates
        # in one agg() — Spark restriction [INVALID_PANDAS_UDF_PLACEMENT].
        .agg(F.round(geomean(F.col("l_quantity")), 6).alias("geomean_qty"))
    )


# ---------------------------------------------------------------------------
# PIVOT: order counts + revenue by priority, pivoted over order status.
# Spark's relational pivot with explicit value list (explicit values avoid
# the extra distinct-scan job AND keep the output schema static — required
# for any production pipeline and for 100 TB, where a discovery pass over
# the fact table costs a full scan). Oracle: the equivalent conditional
# aggregation, which is also exactly how Catalyst lowers pivot.
# ---------------------------------------------------------------------------
_PIVOT_STATUSES = ("F", "O", "P")


@query(
    "orders_pivot",
    oracle=f"""
    SELECT o_orderpriority,
           {', '.join(f'''CAST(SUM(CASE WHEN o_orderstatus = '{s}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{s.lower()},
           {dsum_sql(f"CASE WHEN o_orderstatus = '{s}' THEN o_totalprice ELSE 0.0 END", f"rev_{s.lower()}")}''' for s in _PIVOT_STATUSES)}
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "pivot"),
)
def orders_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    piv = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(_PIVOT_STATUSES))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice"), "rev"),
        )
    )
    # flatten pivot's {value}_{agg} names to the oracle's n_{s} / rev_{s}
    return piv.select(
        "o_orderpriority",
        *[
            col
            for s in _PIVOT_STATUSES
            for col in (
                F.col(f"{s}_n").alias(f"n_{s.lower()}"),
                F.col(f"{s}_rev").alias(f"rev_{s.lower()}"),
            )
        ],
    )


# ---------------------------------------------------------------------------
# Ordered collect_list / listagg: per-nation roster of the top suppliers.
# Cross-engine determinism demands an explicit sort of the collected list
# (unordered aggregation order differs between engines and between Spark
# partitions — same issue dsum solves for sums).
# ---------------------------------------------------------------------------
@query(
    "agg_collect_sorted",
    oracle="""
    SELECT s_nationkey,
           list_sort(list(s_suppkey)) AS supp_ids,
           array_to_string(list_sort(list(s_name)), ',') AS roster
    FROM supplier
    WHERE s_acctbal > 9000
    GROUP BY s_nationkey
    """,
    tags=("agg", "collect_list", "listagg"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy("s_nationkey")
        .agg(
            F.sort_array(F.collect_list("s_suppkey")).alias("supp_ids"),
            F.array_join(F.sort_array(F.collect_list("s_name")), ",").alias("roster"),
        )
    )


# ---------------------------------------------------------------------------
# UNPIVOT (melt) — the inverse of orders_pivot: wide per-status aggregate
# columns back to (priority, status, n) long form. Spark's DataFrame.unpivot
# lowers to a single Expand (same operator CUBE uses) — no join, no UDF.
# ---------------------------------------------------------------------------
@query(
    "orders_unpivot",
    oracle="""
    WITH wide AS (
      SELECT o_orderpriority,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
             CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status, n FROM (
      SELECT o_orderpriority, 'F' AS status, n_f AS n FROM wide
      UNION ALL SELECT o_orderpriority, 'O', n_o FROM wide
      UNION ALL SELECT o_orderpriority, 'P', n_p FROM wide
    )
    """,
    tags=("agg", "unpivot", "melt"),
)
def orders_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.col("F").alias("n_f"),
            F.col("O").alias("n_o"),
            F.col("P").alias("n_p"),
        )
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["n_f", "n_o", "n_p"],
        variableColumnName="status",
        valueColumnName="n",
    ).withColumn("status", F.upper(F.substring(F.col("status"), 3, 1)))


# ---------------------------------------------------------------------------
# Grouped-map applyInPandas — the fourth Arrow path (alongside mapInPandas,
# grouped-agg pandas UDF, and applyInPandasWithState): whole-group
# transformation, here per-nation z-score normalization of supplier
# balances. The JVM/SQL twin ((x-avg)/stddev over a window) is the oracle,
# so the grouped-map path itself is differentially verified.
# ---------------------------------------------------------------------------
@query(
    "udf_grouped_map_zscore",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           ROUND((s_acctbal - AVG(s_acctbal) OVER (PARTITION BY s_nationkey))
                 / STDDEV_SAMP(s_acctbal) OVER (PARTITION BY s_nationkey), 4) AS bal_z
    FROM supplier
    """,
    tags=("udf", "applyInPandas", "grouped_map", "mapInPandas"),
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from pyspark.sql.types import DoubleType, IntegerType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_nationkey", IntegerType()),
            StructField("bal_z", DoubleType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["s_acctbal"]
        z = (bal - bal.mean()) / bal.std(ddof=1)
        return pd.DataFrame(
            {
                "s_suppkey": pdf["s_suppkey"],
                "s_nationkey": pdf["s_nationkey"],
                "bal_z": z.round(4),
            }
        )

    return (
        table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        .groupBy("s_nationkey")
        .applyInPandas(zscore, schema)
    )


# ---------------------------------------------------------------------------
# percent_rank + cume_dist — the two distribution window functions, closing
# out the window family (rank/dense_rank/row_number/ntile/lead/lag/
# first/last/frames are covered elsewhere).
# ---------------------------------------------------------------------------
@query(
    "window_distribution",
    oracle="""
    SELECT s_nationkey, s_suppkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr,
           ROUND(CUME_DIST() OVER w, 6) AS cd
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    """,
    tags=("window", "percent_rank", "cume_dist"),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return table(spark, sf_dir, "supplier").select(
        "s_nationkey",
        "s_suppkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


# ---------------------------------------------------------------------------
# Statistical + boolean aggregates: corr / covar_samp (Pearson, rounded —
# product sums are order-dependent in the last ulps) and bool_and/bool_or —
# the two aggregate families §2.4 doesn't otherwise touch.
# ---------------------------------------------------------------------------
@query(
    "agg_stats_bool",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_discount), 6) AS qty_disc_covar,
           bool_and(l_quantity > 0) AS all_positive_qty,
           bool_or(l_discount > 0.09) AS any_high_discount
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "corr", "bool"),
)
def agg_stats_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("qty_disc_covar"),
            F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_high_discount"),
        )
    )


# ---------------------------------------------------------------------------
# Date-spine gap fill: a complete calendar spine (sequence between the
# corpus min/max ship date) LEFT-joined to daily revenue, missing days
# filled with zero and flagged — the standard time-series densification
# every reporting rollup needs before window math. The spine is generated
# (never materialized in storage) and is bounded by the date range, not by
# SF; the daily aggregate is one shuffle on day.
# ---------------------------------------------------------------------------
@query(
    "daily_gapfill",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             {dsum_sql('l_extendedprice', 'day_rev')},
             COUNT(*) AS n_lines
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
      GROUP BY CAST(l_shipdate AS DATE)
    ), spine AS (
      SELECT CAST(unnest(generate_series(DATE '1997-01-01', DATE '1997-03-31',
                                         INTERVAL 1 DAY)) AS DATE) AS day
    )
    SELECT spine.day,
           COALESCE(day_rev, 0.0) AS day_rev,
           COALESCE(n_lines, 0) AS n_lines,
           CASE WHEN daily.d IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM spine LEFT JOIN daily ON spine.day = daily.d
    ORDER BY spine.day
    """,
    tags=("olap", "gapfill", "timeseries"),
)
def daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-04-01").cast("date"))
    )
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        dsum(F.col("l_extendedprice"), "day_rev"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1997-01-01").cast("date"),
                F.lit("1997-03-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    return (
        F.broadcast(spine)  # bounded by the date range, never by SF
        .join(daily, F.col("day") == F.col("d"), "left")
        .select(
            "day",
            F.coalesce(F.col("day_rev"), F.lit(0.0)).alias("day_rev"),
            F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
            F.when(F.col("d").isNull(), 1).otherwise(0).alias("is_gap"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Higher statistical moments (skewness, excess kurtosis) computed from raw
# power sums. Built-in skewness/kurtosis differ across engines (population
# vs sample corrections), so both sides compute the SAME closed form from
# dsum(x), dsum(x²), dsum(x³), dsum(x⁴) — order-independent, bit-identical,
# and a single aggregation pass (4 conditional sums, no second scan).
# ---------------------------------------------------------------------------
@query(
    "agg_moments",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             {dsum_sql('l_quantity', 's1')},
             {dsum_sql('l_quantity * l_quantity', 's2')},
             {dsum_sql('l_quantity * l_quantity * l_quantity', 's3')},
             {dsum_sql('l_quantity * l_quantity * l_quantity * l_quantity', 's4')}
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND(s1 / n, 6) AS mean_qty,
           ROUND((s2 / n - (s1 / n) * (s1 / n)), 6) AS var_qty,
           ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / POW(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skew_qty,
           ROUND((s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / POW(s2 / n - (s1 / n) * (s1 / n), 2) - 3, 6) AS kurt_qty
    FROM s
    """,
    tags=("agg", "stats", "moments"),
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = F.col("l_quantity")
    s = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(q, "s1"),
            dsum(q * q, "s2"),
            dsum(q * q * q, "s3"),
            dsum(q * q * q * q, "s4"),
        )
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    m = s1 / n
    m2 = s2 / n - m * m
    skew = (s3 / n - 3 * m * (s2 / n) + 2 * m * m * m) / F.pow(m2, 1.5)
    kurt = (s4 / n - 4 * m * (s3 / n) + 6 * m * m * (s2 / n) - 3 * m * m * m * m) / F.pow(m2, 2) - 3
    return s.select(
        "l_returnflag",
        "n",
        F.round(m, 6).alias("mean_qty"),
        F.round(m2, 6).alias("var_qty"),
        F.round(skew, 6).alias("skew_qty"),
        F.round(kurt, 6).alias("kurt_qty"),
    )


# ---------------------------------------------------------------------------
# Cohort lifetime value: customers grouped by first-order year (the cohort),
# revenue tracked by years-since-first-order offset. Two aggregation grains
# (per-customer min for the cohort, then cohort×offset rollup) — the
# classic product-analytics retention-revenue matrix in one pass over
# orders. The per-customer grain shuffles on custkey; the cohort matrix is
# bounded (years × offsets), so the second aggregation is cheap at any SF.
# ---------------------------------------------------------------------------
@query(
    "orders_cohort_ltv",
    oracle=f"""
    WITH firsts AS (
      SELECT o_custkey AS fc_custkey,
             MIN(CAST(year(o_orderdate) AS INT)) AS cohort_year
      FROM orders GROUP BY o_custkey
    )
    SELECT cohort_year,
           CAST(year(o_orderdate) AS INT) - cohort_year AS year_offset,
           COUNT(DISTINCT o_custkey) AS active_customers,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice', 'cohort_revenue')}
    FROM orders JOIN firsts ON o_custkey = fc_custkey
    GROUP BY cohort_year, CAST(year(o_orderdate) AS INT) - cohort_year
    """,
    tags=("olap", "cohort", "analytics"),
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = table(spark, sf_dir, "orders")
    firsts = ords.groupBy(F.col("o_custkey").alias("fc_custkey")).agg(
        F.min(F.year("o_orderdate").cast("int")).alias("cohort_year")
    )
    return (
        ords.join(firsts, ords.o_custkey == firsts.fc_custkey)
        .groupBy(
            "cohort_year",
            (F.year("o_orderdate").cast("int") - F.col("cohort_year")).alias("year_offset"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("active_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "cohort_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# ABC / Pareto classification: parts ranked by revenue, classified by
# cumulative revenue share (A ≤ 70%, B ≤ 90%, C rest). The per-part grain
# scales linearly with SF, so the global cumulative sum goes through the
# distributed decomposition (functions/ranking.py): boundary-bucketed
# per-bucket running sums + broadcast prefix offsets — no partition-less
# WindowExec anywhere in the plan (asserted in test_plans.py).
#
# The cumulative math runs in exact DECIMAL(28,6) (part_rev is a dsum
# output, ≤1 ulp from its 6-dp rational, so ROUND(...,6) recovers it
# exactly — CLAUDE.md rounding rule) and the 70/90% thresholds compare
# as cum*10 <= tot*7 / cum*10 <= tot*9 — integer-scaled decimal products
# both engines compute exactly (DECIMAL(28,6)*INT → DECIMAL(38,6) in
# both), so no float ratio crosses engines and no BIGINT micro-unit
# overflow at large SF (DECIMAL(38,6) holds ~1e32).
# ---------------------------------------------------------------------------
@query(
    "abc_classification",
    oracle=f"""
    WITH pr AS (
      SELECT l_partkey, {dsum_sql(_REV_EXPR, 'part_rev')}
      FROM lineitem GROUP BY l_partkey
    ), r AS (
      SELECT l_partkey, part_rev,
             CAST(ROUND(part_rev, 6) AS DECIMAL(28,6)) AS rev_d
      FROM pr
    ), ranked AS (
      SELECT part_rev,
             CAST(SUM(rev_d) OVER (ORDER BY part_rev DESC, l_partkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(28,6)) AS cum_d,
             CAST(SUM(rev_d) OVER () AS DECIMAL(28,6)) AS tot_d
      FROM r
    )
    SELECT CASE WHEN cum_d * 10 <= tot_d * 7 THEN 'A'
                WHEN cum_d * 10 <= tot_d * 9 THEN 'B'
                ELSE 'C' END AS abc_class,
           COUNT(*) AS n_parts,
           {dsum_sql('part_rev', 'class_revenue')}
    FROM ranked
    GROUP BY 1
    """,
    tags=("olap", "pareto", "window", "analytics"),
)
def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pr = li.groupBy("l_partkey").agg(dsum(rev, "part_rev"))
    prd = pr.withColumn("rev_d", F.round("part_rev", 6).cast("decimal(28,6)"))
    tot = prd.agg(F.sum("rev_d").cast("decimal(28,6)").alias("tot_d"))
    ranked = with_global_rank(
        prd,
        [("part_rev", "desc"), ("l_partkey", "asc")],
        rank_name=None,
        running=(("rev_d", "cum_raw"),),
    ).withColumn("cum_d", F.col("cum_raw").cast("decimal(28,6)"))
    cls = (
        F.when(F.col("cum_d") * F.lit(10) <= F.col("tot_d") * F.lit(7), "A")
        .when(F.col("cum_d") * F.lit(10) <= F.col("tot_d") * F.lit(9), "B")
        .otherwise("C")
    )
    return (
        ranked.join(F.broadcast(tot))
        .groupBy(cls.alias("abc_class"))
        .agg(F.count(F.lit(1)).alias("n_parts"), dsum(F.col("part_rev"), "class_revenue"))
    )


# ---------------------------------------------------------------------------
# RFM segmentation: per-customer Recency/Frequency/Monetary scored into
# quintiles (NTILE(5) with the o_custkey tiebreak for cross-engine
# determinism), rolled up to segment counts + revenue. The per-customer
# aggregate shuffles once on custkey; the three quintile scores then go
# through the distributed ranking decomposition (functions/ranking.py) —
# three range-partitioned passes over the |customer| grain, each adding
# a global rank with NO single-reducer window (ntile_expr derives the
# exact NTILE bucket from rank + total count arithmetically, so the
# DuckDB NTILE oracle stays bit-identical).
# ---------------------------------------------------------------------------
@query(
    "orders_rfm",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)), DATE '1998-08-02') AS recency_days,
             COUNT(*) AS frequency,
             {dsum_sql('o_totalprice', 'monetary')}
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT monetary,
             NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
             NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
             NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
      FROM per_cust
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_customers,
           {dsum_sql('monetary', 'segment_revenue')}
    FROM scored
    GROUP BY r_score, f_score, m_score
    """,
    tags=("olap", "rfm", "window", "ntile", "analytics"),
)
def orders_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_cust = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.lit("1998-08-02").cast("date"), F.max(F.to_date("o_orderdate"))
            ).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            dsum(F.col("o_totalprice"), "monetary"),
        )
    )
    # ONE shared sample job + ONE counts job derive all three ranks'
    # boundaries and offsets (with_global_ranks); the ranked plan is the
    # persisted per-customer frame + three partitioned windows. (Earlier
    # shapes measured at sf0.1: chained with_global_rank calls 10.6 s —
    # the chain doubles the plan per level — and three parallel
    # single-rank branches 4.5 s from six builder-time jobs.)
    scored = with_global_ranks(
        per_cust,
        [
            ("_r_rk", [("recency_days", "asc"), ("o_custkey", "asc")]),
            ("_f_rk", [("frequency", "desc"), ("o_custkey", "asc")]),
            ("_m_rk", [("monetary", "desc"), ("o_custkey", "asc")]),
        ],
        n_name="_n",
    ).select(
        "monetary",
        ntile_expr("_r_rk", "_n", 5).alias("r_score"),
        ntile_expr("_f_rk", "_n", 5).alias("f_score"),
        ntile_expr("_m_rk", "_n", 5).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"), dsum(F.col("monetary"), "segment_revenue")
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence: order priority × order status
# contingency table, expected counts from row/col marginals, per-cell
# (obs-exp)²/exp contributions and the global statistic. One shuffle
# builds the contingency (bounded 5×3 grain); the marginals are windows
# over that bounded grain, so the "global" windows never touch the fact
# table — the safe pattern for grand-total math at 100 TB.
# ---------------------------------------------------------------------------
@query(
    "stats_chi2",
    oracle="""
    WITH cont AS (
      SELECT o_orderpriority AS pri, o_orderstatus AS st, COUNT(*) AS obs
      FROM orders GROUP BY 1, 2
    ), m AS (
      SELECT pri, st, obs,
             SUM(obs) OVER (PARTITION BY pri) AS row_tot,
             SUM(obs) OVER (PARTITION BY st) AS col_tot,
             SUM(obs) OVER () AS grand
      FROM cont
    )
    SELECT pri, st, CAST(obs AS BIGINT) AS obs,
           ROUND(row_tot * col_tot / CAST(grand AS DOUBLE), 4) AS expected,
           ROUND(POWER(obs - row_tot * col_tot / CAST(grand AS DOUBLE), 2)
                 / (row_tot * col_tot / CAST(grand AS DOUBLE)), 6) AS chi2_term
    FROM m
    """,
    tags=("olap", "stats", "chi2", "analytics"),
)
def stats_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    cont = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("pri"), F.col("o_orderstatus").alias("st"))
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    w_row = Window.partitionBy("pri")
    w_col = Window.partitionBy("st")
    w_all = Window.partitionBy()
    exp = F.col("row_tot") * F.col("col_tot") / F.col("grand").cast("double")
    return (
        cont.select(
            "pri",
            "st",
            "obs",
            F.sum("obs").over(w_row).alias("row_tot"),
            F.sum("obs").over(w_col).alias("col_tot"),
            F.sum("obs").over(w_all).alias("grand"),
        )
        .select(
            "pri",
            "st",
            "obs",
            F.round(exp, 4).alias("expected"),
            F.round(F.pow(F.col("obs") - exp, 2) / exp, 6).alias("chi2_term"),
        )
    )


# ---------------------------------------------------------------------------
# Pareto skyline: per brand, the parts not dominated on (retailprice min,
# size max). The declarative definition is a quadratic NOT EXISTS self-join
# (the oracle keeps that form); the Spark plan is the O(n log n) sweep —
# sort by price within brand, and a part is dominated iff a strictly
# cheaper part has size >= its size (running MAX over a RANGE frame on
# integer cents) or an equal-priced part has strictly larger size. One
# window shuffle on brand vs the oracle's O(n^2) join — the survives-100x
# rewrite of a multi-criteria "best offers" query.
# ---------------------------------------------------------------------------
@query(
    "part_skyline",
    oracle="""
    SELECT p.p_brand, p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_brand = p.p_brand
        AND q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
    tags=("skyline", "window", "analytics"),
)
def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").select(
        "p_brand", "p_partkey", "p_retailprice", "p_size",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_c"),
    )
    w_cheaper = (
        Window.partitionBy("p_brand")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("p_brand", "price_c")
    dominated = (
        F.coalesce(F.max("p_size").over(w_cheaper) >= F.col("p_size"), F.lit(False))
        | (F.max("p_size").over(w_same) > F.col("p_size"))
    )
    return (
        p.withColumn("__dom", dominated)
        .filter(~F.col("__dom"))
        .select("p_brand", "p_partkey", "p_retailprice", "p_size")
    )


# ---------------------------------------------------------------------------
# Gini concentration of customer spend per nation. Spend is rescaled to
# millions and rounded BEFORE the rank-weighted sums (identical per-row
# doubles on both engines; keeps i*x inside DECIMAL(18,6) range at any SF —
# raw dollars would overflow the exact accumulator). Rank ties break on the
# unique custkey, so the i*x_i sum is parallelism-invariant. Two shuffles:
# customer-key agg, then one window + agg per nation. Customers with no
# orders count as zero spend — that is what makes it a concentration audit.
# ---------------------------------------------------------------------------
@query(
    "customer_gini",
    oracle="""
    WITH spend AS (
      SELECT c.c_custkey, c.c_nationkey,
             ROUND(COALESCE({psum}, 0) / 1000000, 6) AS x
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey
    ), ranked AS (
      SELECT c_nationkey, x,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY x, c_custkey) AS i
      FROM spend
    )
    SELECT n.n_name,
           COUNT(*) AS n_customers,
           ROUND(2 * {six} / (COUNT(*) * {sx}) - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM ranked r JOIN nation n ON n.n_nationkey = r.c_nationkey
    GROUP BY n.n_name
    """.format(
        psum=dsum_sql("o.o_totalprice"),
        six=dsum_sql("r.i * r.x"),
        sx=dsum_sql("r.x"),
    ),
    tags=("gini", "window", "analytics"),
)
def customer_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    spend = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.round(
                F.coalesce(dec_to_double(F.sum(money(F.col("o_totalprice")))), F.lit(0.0))
                / 1000000,
                6,
            ).alias("x")
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy("x", "c_custkey")
    ranked = spend.withColumn("i", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(nation), ranked.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                2 * dec_to_double(F.sum(money(F.col("i") * F.col("x"))))
                / (F.count(F.lit(1)) * dec_to_double(F.sum(money(F.col("x")))))
                - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
                6,
            ).alias("gini"),
        )
    )


# ---------------------------------------------------------------------------
# Cogrouped Arrow UDF — the one pandas-UDF surface not yet exercised
# (SURVEY.md §2.11): DataFrame.groupBy().cogroup().applyInPandas. The
# canonical use is a per-key as-of merge (pandas merge_asof), here the
# purchases⇐clicks attribution join, differentially verified against
# DuckDB's native ASOF JOIN — and against the pure-JVM union+window
# formulation (events_asof_join), giving the same operator three
# independent implementations. Scale: cogroup shuffles BOTH sides once on
# user_id; per-user groups are bounded (events per user), so Arrow batches
# stay small and the merge is linear per group. Python is sanctioned here:
# the point IS the cogrouped-Arrow surface; the JVM twin exists for the
# hot path.
# ---------------------------------------------------------------------------
@query(
    "udf_cogrouped_asof",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ), purchases AS (
      SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, c.click_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("udf", "cogroup", "applyInPandas", "asof"),
)
def udf_cogrouped_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = table(spark, sf_dir, "events")
    # Cogroup on a COARSE user bucket, not user_id: per-user groups mean
    # one pandas invocation + Arrow batch per user (first cut benched
    # 9.35 s at sf0.1 — heaviest query in the set); 64 shards cut that to
    # 64 vectorized merge_asof(by="user_id") calls (0.9 s) while
    # preserving exact per-user semantics. Same principle at 100 TB:
    # bound the group count, let the kernel vectorize within the shard.
    ub = F.pmod(F.col("user_id"), F.lit(64)).alias("ub")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select(ub, "user_id", "ts", "click_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        ub, F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )

    def asof_merge(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        if left.empty:
            return pd.DataFrame(
                {"purchase_id": [], "user_id": [], "click_id": [], "gap_us": []}
            )
        left = left.sort_values("ts", kind="mergesort")
        if right.empty:
            merged = left.assign(click_ts=pd.NaT, click_id=pd.NA)
        else:
            right = right.sort_values("ts", kind="mergesort")[
                ["user_id", "ts", "click_id"]
            ].rename(columns={"ts": "click_ts"})
            merged = pd.merge_asof(
                left,
                right,
                left_on="ts",
                right_on="click_ts",
                by="user_id",  # per-user as-of within the shard
                direction="backward",
                allow_exact_matches=True,  # inclusive as-of: p.ts >= c.ts
            )
        delta = merged["ts"] - merged["click_ts"]
        return pd.DataFrame(
            {
                "purchase_id": merged["purchase_id"],
                "user_id": merged["user_id"],
                "click_id": merged["click_id"].astype("Int64"),
                "gap_us": (delta // pd.Timedelta(microseconds=1)).astype("Int64"),
            }
        )

    return (
        purchases.groupBy("ub")
        .cogroup(clicks.groupBy("ub"))
        .applyInPandas(
            asof_merge,
            "purchase_id long, user_id long, click_id long, gap_us long",
        )
    )


# ---------------------------------------------------------------------------
# Deterministic MODE — Spark's and DuckDB's builtin mode() both break
# frequency ties arbitrarily, which is useless for a hash-verified result;
# the canonical deterministic form is count + row_number ordered by
# (count DESC, value ASC). One shuffle on (flag, qty), one on flag for the
# bounded window (|flags| partitions of |distinct qty| rows — tiny).
# ---------------------------------------------------------------------------
@query(
    "agg_mode",
    oracle="""
    WITH freq AS (
      SELECT l_returnflag, l_quantity AS qty, CAST(COUNT(*) AS BIGINT) AS n,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag ORDER BY COUNT(*) DESC, l_quantity ASC
             ) AS rn
      FROM lineitem
      GROUP BY l_returnflag, l_quantity
    )
    SELECT l_returnflag, CAST(qty AS DOUBLE) AS mode_qty, n AS mode_count
    FROM freq WHERE rn = 1
    """,
    tags=("agg", "mode", "deterministic"),
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    freq = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", F.col("l_quantity").alias("qty"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.col("n").desc(), F.col("qty").asc())
    return (
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("qty").cast("double").alias("mode_qty"),
            F.col("n").alias("mode_count"),
        )
    )


# ---------------------------------------------------------------------------
# Python UDTF (Spark 4's user-defined TABLE function — one input row,
# many output rows) via LATERAL: word bigrams with positions. This is the
# remaining Python-integration surface after scalar/grouped-agg/grouped-
# map/cogrouped UDFs (§2.11); the tokenization replicates the engine-wide
# `' +'`-split exactly so the DuckDB shifted-zip oracle verifies every
# row. Python-per-row is the POINT of the surface here (sanctioned via
# the udtf tag, excluded from the no-python-hot-path sweep); the
# set-oriented twin of this exact computation is the JVM zip_with path in
# text_hof/text_chunk.
# ---------------------------------------------------------------------------
@query(
    "udtf_bigrams",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), ' +') AS tk
      FROM documents WHERE doc_id < 25
    )
    SELECT doc_id, CAST(z[3] - 1 AS INT) AS pos, z[1] || ' ' || z[2] AS bigram
    FROM (
      SELECT doc_id,
             unnest(list_zip(tk[1:len(tk)-1], tk[2:len(tk)],
                             generate_series(1, len(tk)-1))) AS z
      FROM t
    )
    """,
    tags=("udtf", "lateral", "text", "python-sanctioned"),
)
def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    class Bigrams:
        def eval(self, doc_id, text):
            import re

            # strip(' ') not strip(): match trim()/F.trim (space-only) so the
            # oracle stays in sync if a fixture ever has edge tabs/newlines.
            toks = re.split(" +", (text or "").strip(" "))
            for i, (a, b) in enumerate(zip(toks, toks[1:])):
                yield doc_id, i, f"{a} {b}"

    spark.udtf.register(
        "bigrams_udtf", udtf(Bigrams, returnType="doc_id bigint, pos int, bigram string")
    )
    table(spark, sf_dir, "documents").filter(F.col("doc_id") < 25).createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        "SELECT b.doc_id, b.pos, b.bigram "
        "FROM __udtf_docs d, LATERAL bigrams_udtf(d.doc_id, d.text) b"
    )


# ---------------------------------------------------------------------------
# mapInArrow — the zero-pandas Arrow batch surface (RecordBatch in,
# RecordBatch out; no pandas conversion cost): per-doc token counts
# computed with vectorized pyarrow.compute kernels (C++ executed, Python
# only orchestrates batches). Where mapInPandas pays Arrow→pandas→Arrow,
# this stays in Arrow end-to-end — the right shape for binary/tensor
# columns at 100 TB. Repartition first: single-file fixtures otherwise
# scan as ONE batch stream (CLAUDE.md gotcha).
# ---------------------------------------------------------------------------
@query(
    "udf_maparrow_tokencount",
    oracle="""
    SELECT doc_id, CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens
    FROM documents
    """,
    tags=("udf", "mapInArrow", "arrow", "python-sanctioned"),
)
def udf_maparrow_tokencount(spark: SparkSession, sf_dir: str) -> DataFrame:
    def count_tokens(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            # trim SPACES only — matches Spark F.trim / DuckDB trim(), not
            # all-whitespace utf8_trim_whitespace
            text = pc.utf8_trim(batch.column("text"), characters=" ")
            toks = pc.split_pattern_regex(text, " +")
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), pc.list_value_length(toks).cast(pa.int64())],
                ["doc_id", "n_tokens"],
            )

    docs = (
        table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", "text")
    )
    return docs.mapInArrow(count_tokens, "doc_id long, n_tokens long")



# ---------------------------------------------------------------------------
# Year-over-year growth in integer basis points: monthly revenue in exact
# BIGINT cents (o_totalprice is a 2-dp double, so ROUND(x*100) is ≥1e5
# ulps from any .5 boundary), YoY delta via lag(12-months-ago) = a self
# join on (year-1, month), growth_bp = FLOOR(10000·Δ/prev) — a single
# IEEE division of identical BIGINT operands on both engines, then FLOOR
# (no ROUND tie class; integer-valued quotients are exact by
# construction, see pipeline_ml.py's fixed-point notes).
#
# Scale: one aggregation to |months| rows; everything after is
# bounded-size. The classic period-over-period dashboard query.
# ---------------------------------------------------------------------------
@query(
    "orders_yoy_growth",
    oracle="""
    WITH monthly AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mon,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1, 2
    )
    SELECT cur.yr, cur.mon, cur.rev_cents, cur.n_orders,
           prev.rev_cents AS prev_rev_cents,
           CAST(FLOOR(10000.0 * (cur.rev_cents - prev.rev_cents) / prev.rev_cents) AS BIGINT) AS yoy_growth_bp
    FROM monthly cur JOIN monthly prev
      ON prev.yr = cur.yr - 1 AND prev.mon = cur.mon
    ORDER BY cur.yr, cur.mon
    """,
    tags=("olap", "timeseries", "period_over_period"),
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    monthly = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mon"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("rev_cents"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )
    cur, prev = monthly.alias("cur"), monthly.alias("prev")
    return (
        cur.join(
            prev,
            (F.col("prev.yr") == F.col("cur.yr") - 1) & (F.col("prev.mon") == F.col("cur.mon")),
        )
        .select(
            F.col("cur.yr").alias("yr"),
            F.col("cur.mon").alias("mon"),
            F.col("cur.rev_cents").alias("rev_cents"),
            F.col("cur.n_orders").alias("n_orders"),
            F.col("prev.rev_cents").alias("prev_rev_cents"),
            F.floor(
                10000.0 * (F.col("cur.rev_cents") - F.col("prev.rev_cents")) / F.col("prev.rev_cents")
            )
            .cast("long")
            .alias("yoy_growth_bp"),
        )
        .orderBy("yr", "mon")
    )


# ---------------------------------------------------------------------------
# Inter-purchase gap analysis, rolled up per nation.
#
# Per-customer order gaps via LAG over (custkey; orderdate, orderkey) —
# the unique orderkey tiebreak makes same-day orders deterministic —
# then integer-only nation rollup (datediff is exact). The window
# partitions by customer (bounded orders-per-customer), the rollup by
# nation: no global sort, two key-partitioned shuffles, scale-linear.
# ---------------------------------------------------------------------------
@query(
    "orders_interpurchase_gap",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
               LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS gap_days
      FROM orders
    ), per_cust AS (
      SELECT o_custkey,
             COUNT(*) AS n_orders,
             COUNT(gap_days) AS n_gaps,
             COALESCE(SUM(gap_days), 0) AS sum_gap,
             MAX(gap_days) AS max_gap
      FROM gaps GROUP BY o_custkey
    )
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(pc.n_orders) AS BIGINT) AS n_orders,
           CAST(SUM(pc.n_gaps) AS BIGINT) AS n_gaps,
           CAST(SUM(pc.sum_gap) AS BIGINT) AS sum_gap_days,
           CAST(MAX(pc.max_gap) AS BIGINT) AS max_gap_days
    FROM per_cust pc
    JOIN customer c ON c.c_custkey = pc.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    tags=("orders", "window", "behavioral"),
)
def orders_interpurchase_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_days"),
    )
    per_cust = gaps.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.count("gap_days").alias("n_gaps"),
        F.coalesce(F.sum("gap_days"), F.lit(0)).alias("sum_gap"),
        F.max("gap_days").alias("max_gap"),
    )
    return (
        per_cust.join(customer, per_cust.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("n_gaps").cast("long").alias("n_gaps"),
            F.sum("sum_gap").cast("long").alias("sum_gap_days"),
            F.max("max_gap").cast("long").alias("max_gap_days"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Herfindahl–Hirschman market-concentration index per nation.
#
# Supplier share of lineitem volume within each nation, in basis points
# via floor division (integer fixed-point, no rounding ties); HHI = Σ
# share_bp² — the antitrust statistic, 10000² = fully concentrated. Two
# keyed shuffles (supplier rollup, nation rollup); the per-nation totals
# frame is nation-bounded (25 rows at every SF) and broadcast-compliant.
# ---------------------------------------------------------------------------
@query(
    "supplier_hhi",
    oracle="""
    WITH vol AS (
      SELECT s.s_nationkey AS nk, l.l_suppkey AS sk, COUNT(*) AS c
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT nk, SUM(c) AS t FROM vol GROUP BY nk
    ), shares AS (
      SELECT vol.nk, CAST((10000 * vol.c) // tot.t AS BIGINT) AS share_bp
      FROM vol JOIN tot ON vol.nk = tot.nk
    )
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(share_bp * share_bp) AS BIGINT) AS hhi
    FROM shares JOIN nation n ON n.n_nationkey = shares.nk
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    tags=("agg", "fixed_point", "concentration"),
)
def supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    vol = (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nk"), F.col("l_suppkey").alias("sk"))
        .agg(F.count("*").alias("c"))
    )
    tot = vol.groupBy("nk").agg(F.sum("c").alias("t"))
    shares = vol.join(F.broadcast(tot), "nk").select(  # nation-bounded: 25 rows
        "nk", F.expr("(10000 * c) DIV t").alias("share_bp")
    )
    return (
        shares.join(F.broadcast(nation), F.col("nk") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum(F.col("share_bp") * F.col("share_bp")).cast("long").alias("hhi"),
        )
        .orderBy("n_name")
    )
