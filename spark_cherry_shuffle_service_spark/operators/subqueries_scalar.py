"""Subqueries, CTEs and scalar function families (SURVEY.md §2.8-2.9).

Shapes from the reference corpus: uncorrelated scalar subquery vs 1.3×avg
(tpcds/q32.sql), correlated per-group average (q44/q9), multi-CTE reuse
(q2/q4), IN/NOT IN subqueries (q14a/q38/q69), string functions
(q8 substr/concat, q24a upper/lower), date ± INTERVAL (q5/q72/q16),
round/abs/coalesce (q2/q47/q77).

Scale: the uncorrelated scalar subquery is computed once and broadcast
(crossJoin of a 1-row aggregate — no shuffle of the big side); the
correlated variant becomes a per-group join on the grouping key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_cherry_shuffle_service_spark.functions.aggregates import dec_to_double, davg, dsum
from spark_cherry_shuffle_service_spark.plans.oracle import davg_sql, dsum_sql
from spark_cherry_shuffle_service_spark.plans.registry import query
from spark_cherry_shuffle_service_spark.sources.catalog import table


def _d(col: str) -> F.Column:
    return F.to_date(F.col(col))


# ---------------------------------------------------------------------------
# substr / concat / upper / lower / LIKE — tpcds/q8.sql, q24a (SURVEY.md §2.8,
# §2.2 LIKE).
# ---------------------------------------------------------------------------
@query(
    "string_funcs",
    oracle="""
    SELECT UPPER(SUBSTR(c_name, 1, 8)) AS name_prefix,
           LOWER(c_mktsegment) AS segment,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN c_name LIKE '%00' THEN 1 ELSE 0 END) AS BIGINT) AS n_like_00,
           MIN(CONCAT(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR))) AS min_tag
    FROM customer
    GROUP BY UPPER(SUBSTR(c_name, 1, 8)), LOWER(c_mktsegment)
    """,
    tags=("scalar", "string", "like"),
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            F.upper(F.substring("c_name", 1, 8)).alias("name_prefix"),
            F.lower(F.col("c_mktsegment")).alias("segment"),
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("c_name").like("%00"), 1).otherwise(0)).alias("n_like_00"),
            F.min(F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_nationkey").cast("string"))).alias(
                "min_tag"
            ),
        )
    )


# ---------------------------------------------------------------------------
# DATE + INTERVAL n DAYS arithmetic — tpcds/q5.sql:28-29, q72, q94
# (SURVEY.md §2.8); fixtures store timestamps, so cast first
# (FIXTURES.md note).
# ---------------------------------------------------------------------------
@query(
    "date_interval",
    oracle=f"""
    SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS mon,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice', 'rev')}
    FROM orders
    WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1997-03-01'
                                        AND DATE '1997-03-01' + INTERVAL 90 DAY
    GROUP BY date_trunc('month', CAST(o_orderdate AS DATE))
    """,
    tags=("scalar", "date", "interval"),
)
def date_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    start = F.lit("1997-03-01").cast("date")
    return (
        o.filter(_d("o_orderdate").between(start, F.date_add(start, 90)))
        .groupBy(F.date_trunc("month", _d("o_orderdate")).cast("date").alias("mon"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice"), "rev"))
    )


# ---------------------------------------------------------------------------
# round / abs / coalesce / nullif arithmetic — tpcds/q2.sql, q47, q77
# (SURVEY.md §2.8); NULL synthesis via nullif per FIXTURES.md note.
# ---------------------------------------------------------------------------
@query(
    "math_funcs",
    oracle=f"""
    SELECT l_returnflag,
           ROUND({dsum_sql('ABS(l_extendedprice * (1 - l_discount) - l_extendedprice)')} / COUNT(*), 2)
             AS avg_discount_amount,
           {davg_sql('COALESCE(NULLIF(l_discount, 0.0), 0.05)', 'avg_disc_defaulted')},
           CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("scalar", "math", "null"),
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    price, disc = F.col("l_extendedprice"), F.col("l_discount")
    from spark_cherry_shuffle_service_spark.functions.aggregates import money

    return li.groupBy("l_returnflag").agg(
        F.round(
            dec_to_double(F.sum(money(F.abs(price * (1 - disc) - price)))) / F.count(F.lit(1)), 2
        ).alias("avg_discount_amount"),
        davg(F.coalesce(F.nullif(disc, F.lit(0.0)), F.lit(0.05)), "avg_disc_defaulted"),
        F.sum(F.when(F.nullif(disc, F.lit(0.0)).isNull(), 1).otherwise(0)).alias("n_zero_disc"),
    )


# ---------------------------------------------------------------------------
# Uncorrelated scalar subquery: price > 1.3 × global avg — tpcds/q32.sql
# (SURVEY.md §2.9). DataFrame form: 1-row aggregate broadcast-cross-joined.
# ---------------------------------------------------------------------------
@query(
    "scalar_subquery",
    oracle=f"""
    SELECT p_brand, COUNT(*) AS n_premium
    FROM part
    WHERE p_retailprice > 1.3 * (SELECT {davg_sql('p_retailprice')} FROM part)
    GROUP BY p_brand
    """,
    tags=("subquery", "scalar_subquery"),
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    # AVG must match DuckDB's plain avg: global avg over ~2k rows of 2-dp
    # doubles — deterministic enough only via decimal-sum/count, same as davg.
    avg_df = part.agg(davg(F.col("p_retailprice"), "avg_price"))
    return (
        part.crossJoin(F.broadcast(avg_df))
        .filter(F.col("p_retailprice") > 1.3 * F.col("avg_price"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_premium"))
    )


# ---------------------------------------------------------------------------
# Correlated per-group average comparison — tpcds/q44.sql:17-35 / q9 shape:
# parts priced above 1.2× their brand's average (SURVEY.md §2.9; Catalyst
# decorrelates the SQL form into the same join).
# ---------------------------------------------------------------------------
@query(
    "correlated_subquery",
    oracle=f"""
    WITH brand_avg AS (
      SELECT p_brand AS b_brand, {davg_sql('p_retailprice', 'brand_avg')}
      FROM part GROUP BY p_brand
    )
    SELECT p_brand, COUNT(*) AS n_above_brand_avg
    FROM part JOIN brand_avg ON p_brand = b_brand
    WHERE p_retailprice > 1.2 * brand_avg
    GROUP BY p_brand
    """,
    tags=("subquery", "correlated"),
)
def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    brand_avg = part.groupBy(F.col("p_brand").alias("b_brand")).agg(
        davg(F.col("p_retailprice"), "brand_avg")
    )
    return (
        part.join(F.broadcast(brand_avg), part.p_brand == F.col("b_brand"))
        .filter(F.col("p_retailprice") > 1.2 * F.col("brand_avg"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_above_brand_avg"))
    )


# ---------------------------------------------------------------------------
# Multi-CTE with reuse — tpcds/q2.sql / q4.sql (SURVEY.md §2.9): monthly
# revenue CTE joined to itself month-over-month.
# ---------------------------------------------------------------------------
@query(
    "cte_reuse",
    oracle=f"""
    WITH monthly AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS mon,
             {dsum_sql('o_totalprice', 'rev')},
             COUNT(*) AS n
      FROM orders GROUP BY date_trunc('month', CAST(o_orderdate AS DATE))
    )
    SELECT CAST(a.mon AS DATE) AS mon,
           a.rev AS rev,
           ROUND(b.rev / a.rev, 4) AS next_month_ratio,
           a.n + b.n AS two_month_orders
    FROM monthly a
    JOIN monthly b ON b.mon = a.mon + INTERVAL 1 MONTH
    """,
    tags=("cte", "join", "self"),
)
def cte_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    monthly = (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", _d("o_orderdate")).alias("mon"))
        .agg(dsum(F.col("o_totalprice"), "rev"), F.count(F.lit(1)).alias("n"))
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    return a.join(b, F.col("b.mon") == F.col("a.mon") + F.expr("INTERVAL 1 MONTH")).select(
        F.col("a.mon").cast("date").alias("mon"),
        F.col("a.rev").alias("rev"),
        F.round(F.col("b.rev") / F.col("a.rev"), 4).alias("next_month_ratio"),
        (F.col("a.n") + F.col("b.n")).alias("two_month_orders"),
    )


# ---------------------------------------------------------------------------
# IN (SELECT …) — tpcds/q14a.sql / q82 (SURVEY.md §2.9) → left_semi.
# ---------------------------------------------------------------------------
@query(
    "in_subquery",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n_orders, {dsum_sql('o_totalprice', 'rev')}
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 7500)
    GROUP BY o_orderpriority
    """,
    tags=("subquery", "in", "semi"),
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    rich = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 7500).select("c_custkey")
    o = table(spark, sf_dir, "orders")
    return (
        o.join(rich, o.o_custkey == rich.c_custkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice"), "rev"))
    )


# ---------------------------------------------------------------------------
# NOT IN (SELECT …) — tpcds/q69 shape (SURVEY.md §2.9). Subquery side is
# non-null (key columns), so NOT IN ≡ anti-join here; the NULL-trap is noted
# in SURVEY.md §7.3.
# ---------------------------------------------------------------------------
@query(
    "not_in_subquery",
    oracle="""
    SELECT s_nationkey, COUNT(*) AS n_suppliers
    FROM supplier
    WHERE s_nationkey NOT IN (
      SELECT n_nationkey FROM nation
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    GROUP BY s_nationkey
    """,
    tags=("subquery", "not_in", "anti"),
)
def not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = table(spark, sf_dir, "supplier")
    eu_nations = (
        table(spark, sf_dir, "nation")
        .join(
            F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    return (
        supp.join(eu_nations, supp.s_nationkey == F.col("n_nationkey"), "left_anti")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )


# ---------------------------------------------------------------------------
# String-function breadth #2: regexp_replace (Spark replaces ALL matches by
# default ≙ DuckDB's 'g' flag), translate, lpad/rpad, split_part — the rest
# of the string family around §2.8's substr/concat/upper/lower/LIKE.
# ---------------------------------------------------------------------------
@query(
    "string_funcs2",
    oracle="""
    SELECT p_brand,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           translate(p_type, 'AEIOU', 'aeiou') AS folded,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
           rpad(p_brand, 12, '.') AS padded_brand,
           split_part(p_brand, '#', 2) AS brand_num
    FROM part
    WHERE p_partkey % 50 = 0
    """,
    tags=("string", "regexp", "scalar_funcs"),
)
def string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 50 == 0)
        .select(
            "p_brand",
            F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
            F.translate("p_type", "AEIOU", "aeiou").alias("folded"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
            F.rpad("p_brand", 12, ".").alias("padded_brand"),
            F.split_part(F.col("p_brand"), F.lit("#"), F.lit(2)).alias("brand_num"),
        )
    )


# ---------------------------------------------------------------------------
# Conditional scalar matrix: greatest/least (NULL-skipping), nullif,
# ifnull/coalesce — completing §2.8's conditional family beyond CASE WHEN.
# ---------------------------------------------------------------------------
@query(
    "scalar_conditionals",
    oracle="""
    SELECT s_suppkey,
           greatest(s_acctbal, 0.0) AS bal_floor0,
           least(s_acctbal, 5000.0) AS bal_cap5k,
           nullif(s_nationkey, 0) AS nation_or_null,
           ifnull(nullif(s_nationkey, 0), -1) AS nation_defaulted
    FROM supplier
    WHERE s_suppkey % 7 = 0
    """,
    tags=("scalar_funcs", "conditional"),
)
def scalar_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 7 == 0)
        .select(
            "s_suppkey",
            F.greatest(F.col("s_acctbal"), F.lit(0.0)).alias("bal_floor0"),
            F.least(F.col("s_acctbal"), F.lit(5000.0)).alias("bal_cap5k"),
            F.nullif(F.col("s_nationkey"), F.lit(0)).alias("nation_or_null"),
            F.ifnull(F.nullif(F.col("s_nationkey"), F.lit(0)), F.lit(-1)).alias("nation_defaulted"),
        )
    )
