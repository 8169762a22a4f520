"""Window functions, sorts/top-k and set operations (SURVEY.md §2.5-2.7).

Window shapes mirror the reference corpus: rank()-per-partition
(tpcds/q67.sql:13, q44, q47/q57), running sums with ROWS BETWEEN UNBOUNDED
PRECEDING AND CURRENT ROW (tpcds/q51.sql:5-8), partition-wide avg vs row
deviation (q47/q57), row_number/dense_rank (v2.7 q51a). Set ops: UNION ALL
(q5/q71/q76), UNION-dedup (q14a), INTERSECT (q38/q8), EXCEPT (v2.7 q87
semantics).

Scale: a window over PARTITION BY k shuffles once on k; the running-sum
flagship reuses the groupBy(day) partitioning for the window over the same
key, so Catalyst inserts no second exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_cherry_shuffle_service_spark.functions.aggregates import dec_to_double, dsum
from spark_cherry_shuffle_service_spark.plans.oracle import dec_to_double_sql, dsum_sql
from spark_cherry_shuffle_service_spark.plans.registry import query
from spark_cherry_shuffle_service_spark.sources.catalog import spread, table


def _d(col: str) -> F.Column:
    return F.to_date(F.col(col))


# ---------------------------------------------------------------------------
# rank() OVER (PARTITION BY … ORDER BY …) — tpcds/q67.sql:13 / q44. Unique
# tiebreaker (s_suppkey) keeps ranks deterministic across engines
# (SURVEY.md §7.3 window-ties note).
# ---------------------------------------------------------------------------
@query(
    "window_rank",
    oracle="""
    SELECT * FROM (
      SELECT s_nationkey, s_name, s_acctbal,
             RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS bal_rank
      FROM supplier
    ) WHERE bal_rank <= 3
    """,
    tags=("window", "rank"),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return (
        table(spark, sf_dir, "supplier")
        .select("s_nationkey", "s_name", "s_acctbal", F.rank().over(w).alias("bal_rank"))
        .filter(F.col("bal_rank") <= 3)
    )


# ---------------------------------------------------------------------------
# Running sum over agg-of-agg with ROWS UNBOUNDED PRECEDING — the
# tpcds/q51.sql:5-8 pattern (`sum(sum(...)) OVER (ORDER BY d_date ROWS ...)`).
# ---------------------------------------------------------------------------
@query(
    "window_running_sum",
    oracle=f"""
    WITH daily AS (
      SELECT l_returnflag, CAST(l_shipdate AS DATE) AS d,
             {dsum_sql('l_extendedprice', 'rev')}
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1998-01-01' AND DATE '1998-03-31'
      GROUP BY l_returnflag, CAST(l_shipdate AS DATE)
    )
    SELECT l_returnflag, d, rev,
           {dec_to_double_sql('''SUM(CAST(ROUND(rev, 6) AS DECIMAL(18,6)))
                OVER (PARTITION BY l_returnflag ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')} AS cume_rev
    FROM daily
    """,
    tags=("window", "running_sum", "frame"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        table(spark, sf_dir, "lineitem")
        .filter(_d("l_shipdate").between(F.lit("1998-01-01").cast("date"), F.lit("1998-03-31").cast("date")))
        .groupBy("l_returnflag", _d("l_shipdate").alias("d"))
        .agg(dsum(F.col("l_extendedprice"), "rev"))
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    from spark_cherry_shuffle_service_spark.functions.aggregates import money

    return daily.select(
        "l_returnflag", "d", "rev", dec_to_double(F.sum(money(F.col("rev"))).over(w)).alias("cume_rev")
    )


# ---------------------------------------------------------------------------
# Partition-wide avg vs per-row deviation — tpcds/q47.sql / q57.sql
# (avg_monthly_sales vs sum_sales, SURVEY.md §2.5).
# ---------------------------------------------------------------------------
@query(
    "window_avg_dev",
    oracle=f"""
    WITH monthly AS (
      SELECT l_suppkey, date_trunc('month', CAST(l_shipdate AS DATE)) AS mon,
             {dsum_sql('l_extendedprice', 'sales')}
      FROM lineitem GROUP BY l_suppkey, date_trunc('month', CAST(l_shipdate AS DATE))
    ), with_avg AS (
      SELECT l_suppkey, mon, sales,
             {dec_to_double_sql("SUM(CAST(ROUND(sales, 6) AS DECIMAL(18,6))) OVER (PARTITION BY l_suppkey)")}
               / COUNT(*) OVER (PARTITION BY l_suppkey) AS avg_sales
      FROM monthly
    )
    SELECT l_suppkey, CAST(mon AS DATE) AS mon, sales, ROUND(avg_sales, 4) AS avg_sales,
           ROUND(ABS(sales - avg_sales) / avg_sales, 4) AS dev
    FROM with_avg
    WHERE ABS(sales - avg_sales) / avg_sales > 0.8
    """,
    tags=("window", "avg", "abs"),
)
def window_avg_dev(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_cherry_shuffle_service_spark.functions.aggregates import money

    # spread on l_suppkey: parallelizes the decimal partial agg out of the
    # lone single-row-group scan task AND pre-satisfies both the
    # groupBy(l_suppkey, mon) clustering and the Window.partitionBy
    # (l_suppkey) requirement — 2 Exchanges → 1 (guide §2.4: operations
    # keyed the same way share one exchange). No-op on multi-split scans.
    monthly = (
        spread(
            table(spark, sf_dir, "lineitem").select(
                "l_suppkey", "l_shipdate", "l_extendedprice"
            ),
            "l_suppkey",
        )
        .groupBy("l_suppkey", F.date_trunc("month", _d("l_shipdate")).alias("mon"))
        .agg(dsum(F.col("l_extendedprice"), "sales"))
    )
    w = Window.partitionBy("l_suppkey")
    with_avg = monthly.select(
        "l_suppkey",
        "mon",
        "sales",
        (dec_to_double(F.sum(money(F.col("sales"))).over(w)) / F.count(F.lit(1)).over(w)).alias("avg_sales"),
    )
    dev = F.abs(F.col("sales") - F.col("avg_sales")) / F.col("avg_sales")
    return with_avg.filter(dev > 0.8).select(
        "l_suppkey",
        F.col("mon").cast("date").alias("mon"),
        "sales",
        F.round(F.col("avg_sales"), 4).alias("avg_sales"),
        F.round(dev, 4).alias("dev"),
    )


# ---------------------------------------------------------------------------
# row_number + dense_rank — v2.7 variants (tpcds-v2.7.0/q51a.sql,
# SURVEY.md §2.5). Unique ORDER BY key for determinism.
# ---------------------------------------------------------------------------
@query(
    "window_rownum_dense",
    oracle="""
    SELECT * FROM (
      SELECT p_brand, p_name, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn,
             DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS size_drank
      FROM part
    ) WHERE rn <= 2
    """,
    tags=("window", "row_number", "dense_rank"),
)
def window_rownum_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    w_rn = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    w_dr = Window.partitionBy("p_brand").orderBy("p_size")
    return (
        table(spark, sf_dir, "part")
        .select(
            "p_brand",
            "p_name",
            "p_retailprice",
            F.row_number().over(w_rn).alias("rn"),
            F.dense_rank().over(w_dr).alias("size_drank"),
        )
        .filter(F.col("rn") <= 2)
    )


# ---------------------------------------------------------------------------
# UNION ALL across "channels" — tpcds/q5.sql / q71 / q76 (SURVEY.md §2.7).
# ---------------------------------------------------------------------------
@query(
    "union_all_channels",
    oracle=f"""
    SELECT channel, nationkey, {dsum_sql('bal', 'total_bal')}, COUNT(*) AS n
    FROM (
      SELECT 'customer' AS channel, c_nationkey AS nationkey, c_acctbal AS bal FROM customer
      UNION ALL
      SELECT 'supplier' AS channel, s_nationkey AS nationkey, s_acctbal AS bal FROM supplier
    )
    GROUP BY channel, nationkey
    """,
    tags=("setop", "union_all"),
)
def union_all_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("channel"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("bal"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("channel"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("bal"),
    )
    return (
        cust.unionAll(supp)
        .groupBy("channel", "nationkey")
        .agg(dsum(F.col("bal"), "total_bal"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# UNION with dedup — tpcds/q14a.sql cross-channel (SURVEY.md §2.7).
# ---------------------------------------------------------------------------
@query(
    "union_distinct",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey AS nationkey FROM supplier
    )
    """,
    tags=("setop", "union"),
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


# ---------------------------------------------------------------------------
# INTERSECT — tpcds/q38.sql:11,20 / q8.sql:68 (SURVEY.md §2.7).
# ---------------------------------------------------------------------------
@query(
    "intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
    """,
    tags=("setop", "intersect"),
)
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.intersect(s)


# ---------------------------------------------------------------------------
# EXCEPT — v2.7 q87-family semantics (SURVEY.md §2.7).
# ---------------------------------------------------------------------------
@query(
    "except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000
    """,
    tags=("setop", "except"),
)
def except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 8000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


# ---------------------------------------------------------------------------
# FLAGSHIP — full tpcds/q51.sql shape: two aggregated series → running sums
# via window frames → FULL OUTER JOIN → CASE/COALESCE comparison → top-k.
# Exercises scan/filter/agg/window/full-outer/case/sort/limit in one plan;
# this is `entry()`'s query.
# ---------------------------------------------------------------------------
@query(
    "cumulative_compare",
    oracle=f"""
    WITH o AS (
      SELECT CAST(o_orderdate AS DATE) AS d, {dsum_sql('o_totalprice', 'rev')}
      FROM orders
      WHERE year(CAST(o_orderdate AS DATE)) = 1997
      GROUP BY CAST(o_orderdate AS DATE)
    ), l AS (
      SELECT CAST(l_shipdate AS DATE) AS d, {dsum_sql('l_extendedprice * (1 - l_discount)', 'rev')}
      FROM lineitem
      WHERE year(CAST(l_shipdate AS DATE)) = 1997
      GROUP BY CAST(l_shipdate AS DATE)
    ), oc AS (
      SELECT d, {dec_to_double_sql('''SUM(CAST(ROUND(rev,6) AS DECIMAL(18,6)))
             OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')} AS cume
      FROM o
    ), lc AS (
      SELECT d, {dec_to_double_sql('''SUM(CAST(ROUND(rev,6) AS DECIMAL(18,6)))
             OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')} AS cume
      FROM l
    )
    SELECT COALESCE(oc.d, lc.d) AS day,
           COALESCE(oc.cume, 0) AS order_cume,
           COALESCE(lc.cume, 0) AS ship_cume,
           CASE WHEN COALESCE(oc.cume, 0) > COALESCE(lc.cume, 0)
                THEN 'orders_ahead' ELSE 'ship_ahead' END AS leader
    FROM oc FULL OUTER JOIN lc ON oc.d = lc.d
    ORDER BY day
    LIMIT 100
    """,
    tags=("flagship", "window", "full", "cte", "limit"),
)
def cumulative_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_cherry_shuffle_service_spark.functions.aggregates import money

    cume_w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.year(_d("o_orderdate")) == 1997)
        .groupBy(_d("o_orderdate").alias("d"))
        .agg(dsum(F.col("o_totalprice"), "rev"))
        .select("d", dec_to_double(F.sum(money(F.col("rev"))).over(cume_w)).alias("ocume"))
    )
    l = (
        table(spark, sf_dir, "lineitem")
        .filter(F.year(_d("l_shipdate")) == 1997)
        .groupBy(_d("l_shipdate").alias("d"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "rev"))
        .select(F.col("d").alias("ld"), dec_to_double(F.sum(money(F.col("rev"))).over(cume_w)).alias("lcume"))
    )
    j = o.join(l, o.d == l.ld, "full")
    return (
        j.select(
            F.coalesce(F.col("d"), F.col("ld")).alias("day"),
            F.coalesce(F.col("ocume"), F.lit(0.0)).alias("order_cume"),
            F.coalesce(F.col("lcume"), F.lit(0.0)).alias("ship_cume"),
            F.when(
                F.coalesce(F.col("ocume"), F.lit(0.0)) > F.coalesce(F.col("lcume"), F.lit(0.0)),
                "orders_ahead",
            )
            .otherwise("ship_ahead")
            .alias("leader"),
        )
        .orderBy("day")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-DS v2.7 REWRITE-VARIANT shape (VERDICT r5 "what's missing" #1): the
# reference's corpus runs q51a.sql — q51 with every cumulative window
# REWRITTEN as a rank self-join (tpcds-v2.7.0/q51a.sql:14-30 `v1.rk >=
# v2.rk` + GROUP BY for the running sum; :80-97 the same join again for
# the running MAX over the merged series). This analog reproduces that
# two-level structure on the TPC-H fixtures: per-(priority, day) order
# and ship revenue series, first-level cume via the rank self-join,
# FULL OUTER merge with CASE-keys, second rank self-join for the running
# maxima, comparison filter, top-k. A user benchmarking "same query,
# rewritten plan" parity runs cumulative_compare vs this.
#
# Scale: each self-join is equi on the partition key with rk >= rk
# inside — per-key fan-out is days² where days ≤ 366 (calendar-bounded,
# SF-invariant), so the join grows linearly with keys, never
# quadratically with data. Running sums go through the
# ROUND→DECIMAL(18,6)→SUM convention in BOTH engines (per-day dsum
# outputs are doubles; the second-level sums must stay
# order-independent); running MAX is order-free arithmetic.
# ---------------------------------------------------------------------------
@query(
    "cumulative_compare_v2",
    oracle=f"""
    WITH o_tv AS (
      SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS d,
             {dsum_sql('o_totalprice', 'rev')},
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY CAST(o_orderdate AS DATE)) AS rk
      FROM orders
      WHERE year(CAST(o_orderdate AS DATE)) = 1997
      GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)
    ), o_v1 AS (
      SELECT v1.prio, v1.d,
             {dsum_sql('v2.rev', 'cume')}
      FROM o_tv v1 JOIN o_tv v2 ON v1.prio = v2.prio AND v1.rk >= v2.rk
      GROUP BY v1.prio, v1.d
    ), l_tv AS (
      SELECT o.o_orderpriority AS prio, CAST(l.l_shipdate AS DATE) AS d,
             {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 'rev')},
             ROW_NUMBER() OVER (PARTITION BY o.o_orderpriority
                                ORDER BY CAST(l.l_shipdate AS DATE)) AS rk
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE year(CAST(l.l_shipdate AS DATE)) = 1997
      GROUP BY o.o_orderpriority, CAST(l.l_shipdate AS DATE)
    ), l_v1 AS (
      SELECT v1.prio, v1.d,
             {dsum_sql('v2.rev', 'cume')}
      FROM l_tv v1 JOIN l_tv v2 ON v1.prio = v2.prio AND v1.rk >= v2.rk
      GROUP BY v1.prio, v1.d
    ), v AS (
      SELECT CASE WHEN o.prio IS NOT NULL THEN o.prio ELSE l.prio END AS prio,
             CASE WHEN o.prio IS NOT NULL THEN o.d ELSE l.d END AS d,
             o.cume AS order_cume, l.cume AS ship_cume,
             ROW_NUMBER() OVER (
               PARTITION BY CASE WHEN o.prio IS NOT NULL THEN o.prio ELSE l.prio END
               ORDER BY CASE WHEN o.prio IS NOT NULL THEN o.d ELSE l.d END) AS rk
      FROM o_v1 o FULL OUTER JOIN l_v1 l ON o.prio = l.prio AND o.d = l.d
    )
    SELECT prio, day, order_cume, ship_cume, order_cumulative, ship_cumulative
    FROM (
      SELECT v1.prio, v1.d AS day, v1.order_cume, v1.ship_cume,
             MAX(v2.order_cume) AS order_cumulative,
             MAX(v2.ship_cume) AS ship_cumulative
      FROM v v1 JOIN v v2 ON v1.prio = v2.prio AND v1.rk >= v2.rk
      GROUP BY v1.prio, v1.d, v1.order_cume, v1.ship_cume
    ) x
    WHERE order_cumulative > ship_cumulative
    ORDER BY prio, day
    LIMIT 100
    """,
    tags=("window-rewrite", "self-join", "full", "cte", "limit", "tpcds-v2.7"),
)
def cumulative_compare_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_cherry_shuffle_service_spark.functions.aggregates import money

    def cume_self_join(tv: DataFrame, value: str) -> DataFrame:
        """q51a's window rewrite: running sum via rk >= rk self-join."""
        v2 = tv.select(
            F.col("prio").alias("p2"), F.col("rk").alias("rk2"), F.col(value).alias("rev2")
        )
        return (
            tv.join(v2, (F.col("prio") == F.col("p2")) & (F.col("rk") >= F.col("rk2")))
            .groupBy("prio", "d")
            .agg(dec_to_double(F.sum(money(F.col("rev2")))).alias("cume"))
        )

    w_rk = Window.partitionBy("prio").orderBy("d")
    o_tv = (
        table(spark, sf_dir, "orders")
        .filter(F.year(_d("o_orderdate")) == 1997)
        .groupBy(F.col("o_orderpriority").alias("prio"), _d("o_orderdate").alias("d"))
        .agg(dsum(F.col("o_totalprice"), "rev"))
        .withColumn("rk", F.row_number().over(w_rk))
    )
    o_v1 = cume_self_join(o_tv, "rev")
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders")
    l_tv = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .filter(F.year(_d("l_shipdate")) == 1997)
        .groupBy(F.col("o_orderpriority").alias("prio"), _d("l_shipdate").alias("d"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "rev"))
        .withColumn("rk", F.row_number().over(w_rk))
    )
    l_v1 = cume_self_join(l_tv, "rev")

    lv = l_v1.select(
        F.col("prio").alias("lprio"), F.col("d").alias("ld"), F.col("cume").alias("ship_cume")
    )
    merged = o_v1.withColumnRenamed("cume", "order_cume").join(
        lv, (F.col("prio") == F.col("lprio")) & (F.col("d") == F.col("ld")), "full"
    )
    key = F.when(F.col("prio").isNotNull(), F.col("prio")).otherwise(F.col("lprio"))
    day = F.when(F.col("prio").isNotNull(), F.col("d")).otherwise(F.col("ld"))
    v = merged.select(
        key.alias("prio"), day.alias("d"), "order_cume", "ship_cume"
    ).withColumn("rk", F.row_number().over(w_rk))
    v2 = v.select(
        F.col("prio").alias("p2"),
        F.col("rk").alias("rk2"),
        F.col("order_cume").alias("oc2"),
        F.col("ship_cume").alias("sc2"),
    )
    x = (
        v.join(v2, (F.col("prio") == F.col("p2")) & (F.col("rk") >= F.col("rk2")))
        .groupBy("prio", F.col("d").alias("day"), "order_cume", "ship_cume")
        .agg(
            F.max("oc2").alias("order_cumulative"),
            F.max("sc2").alias("ship_cumulative"),
        )
    )
    return (
        x.filter(F.col("order_cumulative") > F.col("ship_cumulative"))
        .select("prio", "day", "order_cume", "ship_cume", "order_cumulative", "ship_cumulative")
        .orderBy("prio", "day")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-DS v2.7 q67a variant shape: ROLLUP hand-expanded as a UNION ALL of
# progressively coarser re-aggregations over ONE shared pre-aggregate CTE
# (tpcds-v2.7.0/q67a.sql:29-120 — v1.4 q67 says `group by rollup(...)`;
# the v2.7 rewrite unions five explicit GROUP BY levels, then ranks
# within i_category and keeps the top 100). Analog on TPC-H fixtures:
# per-(priority, year, quarter, month) order revenue, four explicit
# levels (full, -month, -quarter, -year), rank within priority by
# revenue desc, top 100 per priority.
#
# Determinism: second-level sums re-aggregate dsum outputs, so they go
# through ROUND→DECIMAL(18,6)→SUM in BOTH engines; the rank is a
# ROW_NUMBER over (sumsales DESC, coalesced level keys) — the coalesce
# sentinels (-1) make the tuple unique across levels, so ties in
# sumsales cannot reorder across engines. Scale: the pre-aggregate is
# calendar×priority bounded; every level re-aggregates the TINY shared
# CTE, not the fact table, and the rank window is partitioned by
# priority — no single-reducer stage.
# ---------------------------------------------------------------------------
@query(
    "rollup_union_variant",
    oracle=f"""
    WITH results AS (
      SELECT o_orderpriority AS prio,
             CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
             CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr,
             CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS mo,
             {dsum_sql('o_totalprice', 'sumsales')}
      FROM orders
      GROUP BY 1, 2, 3, 4
    ), rolled AS (
      SELECT prio, yr, qtr, mo, sumsales FROM results
      UNION ALL
      SELECT prio, yr, qtr, CAST(NULL AS BIGINT), {dsum_sql('sumsales', 'sumsales')}
      FROM results GROUP BY 1, 2, 3
      UNION ALL
      SELECT prio, yr, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
             {dsum_sql('sumsales', 'sumsales')}
      FROM results GROUP BY 1, 2
      UNION ALL
      SELECT prio, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
             {dsum_sql('sumsales', 'sumsales')}
      FROM results GROUP BY 1
    )
    SELECT prio, yr, qtr, mo, sumsales, rk FROM (
      SELECT prio, yr, qtr, mo, sumsales,
             ROW_NUMBER() OVER (PARTITION BY prio
               ORDER BY sumsales DESC, COALESCE(yr, -1), COALESCE(qtr, -1),
                        COALESCE(mo, -1)) AS rk
      FROM rolled
    ) WHERE rk <= 100
    ORDER BY prio, rk
    """,
    tags=("rollup", "union", "window", "tpcds-v2.7"),
)
def rollup_union_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _d("o_orderdate")
    results = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.year(d).cast("bigint").alias("yr"),
            F.quarter(d).cast("bigint").alias("qtr"),
            F.month(d).cast("bigint").alias("mo"),
        )
        .agg(dsum(F.col("o_totalprice"), "sumsales"))
    )
    null_b = F.lit(None).cast("bigint")

    def level(*keep: str) -> DataFrame:
        gb = results.groupBy(*[F.col(k) for k in keep]).agg(
            dsum(F.col("sumsales"), "sumsales")
        )
        for k in ("yr", "qtr", "mo"):
            if k not in keep:
                gb = gb.withColumn(k, null_b)
        return gb.select("prio", "yr", "qtr", "mo", "sumsales")

    rolled = (
        results.select("prio", "yr", "qtr", "mo", "sumsales")
        .unionAll(level("prio", "yr", "qtr"))
        .unionAll(level("prio", "yr"))
        .unionAll(level("prio"))
    )
    w = Window.partitionBy("prio").orderBy(
        F.col("sumsales").desc(),
        F.coalesce(F.col("yr"), F.lit(-1)),
        F.coalesce(F.col("qtr"), F.lit(-1)),
        F.coalesce(F.col("mo"), F.lit(-1)),
    )
    return (
        rolled.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 100)
        .orderBy("prio", "rk")
    )


# ---------------------------------------------------------------------------
# Bag-semantics set ops — EXCEPT ALL / INTERSECT ALL (SURVEY.md §2.7 lists
# the DISTINCT forms in-corpus; the ALL forms complete the family). Inputs
# are projections with real duplicate rows (priority, status).
# ---------------------------------------------------------------------------
@query(
    "setop_except_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0
    EXCEPT ALL
    SELECT o_orderpriority, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
    """,
    tags=("setop", "except_all"),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 3 == 0).select("o_orderpriority", "o_orderstatus")
    b = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderpriority", "o_orderstatus")
    return a.exceptAll(b)


@query(
    "setop_intersect_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0
    INTERSECT ALL
    SELECT o_orderpriority, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
    """,
    tags=("setop", "intersect_all"),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 3 == 0).select("o_orderpriority", "o_orderstatus")
    b = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderpriority", "o_orderstatus")
    return a.intersectAll(b)
