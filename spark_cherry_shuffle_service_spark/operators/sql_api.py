"""SQL-text API parity: the reference executes its entire TPC-DS corpus as
raw SQL strings via spark.sql(queryString) over registered temp views
(TPCDSQueryBenchmark.scala:88,100 + :71). This module exercises that exact
path — catalog registration + SQL text — with dialect-shared SQL that runs
verbatim on BOTH Spark and the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_cherry_shuffle_service_spark.plans.registry import query
from spark_cherry_shuffle_service_spark.sources.catalog import (
    ensure_view,
    register_views,
    spread,
    table,
)

# TPC-H Q4 shape: correlated EXISTS + date filter + group/sort — one SQL
# string, both engines (SURVEY.md §3.1 lifecycle entry point).
_Q_PRIORITY_COUNT = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE)
  )
GROUP BY o_orderpriority
"""

# Multi-CTE + window + set-op in one SQL text (the v2.7-variant style).
_Q_NATION_LEADERS = """
WITH cust AS (
  SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
  FROM customer GROUP BY c_nationkey
), supp AS (
  SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
  FROM supplier GROUP BY s_nationkey
)
SELECT cust.nationkey, n_cust, COALESCE(n_supp, 0) AS n_supp,
       RANK() OVER (ORDER BY n_cust DESC, cust.nationkey) AS cust_rank
FROM cust LEFT JOIN supp ON cust.nationkey = supp.nationkey
"""


@query("sql_text_api", oracle=_Q_PRIORITY_COUNT, tags=("sql", "exists", "api"))
def sql_text_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_PRIORITY_COUNT)


@query("sql_text_cte_window", oracle=_Q_NATION_LEADERS, tags=("sql", "cte", "window", "api"))
def sql_text_cte_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_NATION_LEADERS)


# Channel-union rollup in SQL text — the tpcds/q5.sql shape: sales ⊎
# returns per channel via UNION ALL of per-source aggregates, then a
# channel-level rollup. Dialect-shared (runs verbatim on both engines).
_Q_CHANNEL_UNION = """
SELECT channel, COUNT(*) AS n_rows,
       (CAST(CAST(FLOOR(SUM(CAST(ROUND(amount, 6) AS DECIMAL(18,6)))) AS BIGINT) AS DOUBLE) + CAST(CAST((SUM(CAST(ROUND(amount, 6) AS DECIMAL(18,6))) - FLOOR(SUM(CAST(ROUND(amount, 6) AS DECIMAL(18,6))))) * 1000000 AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS total_amount
FROM (
  SELECT 'order' AS channel, o_totalprice AS amount FROM orders
    WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT 'return' AS channel, l_extendedprice AS amount FROM lineitem
    WHERE l_returnflag = 'R'
)
GROUP BY channel
"""

# EXCEPT-based cross-segment diff — the v2.7 q87 family's semantics
# (customers ordering in 1997 but not 1998), expressed with EXCEPT.
_Q_EXCEPT_CUSTOMERS = """
SELECT COUNT(*) AS n_lapsed FROM (
  SELECT o_custkey FROM orders
  WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
    AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
  EXCEPT
  SELECT o_custkey FROM orders
  WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
    AND CAST(o_orderdate AS DATE) < DATE '1999-01-01'
)
"""

# Correlated scalar subquery in WHERE over an aggregate — the tpcds/q44
# / q32 pattern (rows beating 1.3× their group average).
_Q_ABOVE_AVG = """
SELECT s_nationkey, s_suppkey, s_acctbal
FROM supplier s
WHERE s_acctbal > 1.3 * (
  SELECT AVG(s_acctbal) FROM supplier i WHERE i.s_nationkey = s.s_nationkey
)
"""


@query("sql_text_channel_union", oracle=_Q_CHANNEL_UNION, tags=("sql", "union_all", "api"))
def sql_text_channel_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_CHANNEL_UNION)


@query("sql_text_except", oracle=_Q_EXCEPT_CUSTOMERS, tags=("sql", "except", "api"))
def sql_text_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_EXCEPT_CUSTOMERS)


@query("sql_text_above_avg", oracle=_Q_ABOVE_AVG, tags=("sql", "correlated", "api"))
def sql_text_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_ABOVE_AVG)


# TPC-H Q6 verbatim (modulo fixture column types): the purest
# scan→filter→agg query as ONE dialect-shared SQL text — proof the engine
# runs the reference's corpus style unmodified (spark.sql path) while the
# same string is its own oracle.
_Q_TPCH_Q6 = """
SELECT (CAST(CAST(FLOOR(SUM(CAST(ROUND(l_extendedprice * l_discount, 6) AS DECIMAL(18,6)))) AS BIGINT) AS DOUBLE) + CAST(CAST((SUM(CAST(ROUND(l_extendedprice * l_discount, 6) AS DECIMAL(18,6))) - FLOOR(SUM(CAST(ROUND(l_extendedprice * l_discount, 6) AS DECIMAL(18,6))))) * 1000000 AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("sql_text_tpch_q6", oracle=_Q_TPCH_Q6, tags=("sql", "tpch", "api"))
def sql_text_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_TPCH_Q6)


# ---------------------------------------------------------------------------
# TPC-H spine queries as verbatim SQL text (the reference's only entry
# point is spark.sql(queryString) over 131 SQL files —
# TPCDSQueryBenchmark.scala:88,100). Q1/Q3/Q5/Q10 analogs below run the
# SAME string on Spark and DuckDB: float SUMs go through the
# ROUND→DECIMAL(18,6)→SUM→DOUBLE convention inline, every LIMIT carries a
# unique tiebreak, and date arithmetic uses explicit bounds (DuckDB's
# DATE + INTERVAL returns TIMESTAMP, so interval math stays out of the
# shared dialect).
# ---------------------------------------------------------------------------
_Q_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       (CAST(CAST(FLOOR(SUM(CAST(ROUND(l_quantity, 6) AS DECIMAL(18,6)))) AS BIGINT) AS DOUBLE) + CAST(CAST((SUM(CAST(ROUND(l_quantity, 6) AS DECIMAL(18,6))) - FLOOR(SUM(CAST(ROUND(l_quantity, 6) AS DECIMAL(18,6))))) * 1000000 AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS sum_qty,
       (CAST(CAST(FLOOR(SUM(CAST(ROUND(l_extendedprice, 6) AS DECIMAL(18,6)))) AS BIGINT) AS DOUBLE) + CAST(CAST((SUM(CAST(ROUND(l_extendedprice, 6) AS DECIMAL(18,6))) - FLOOR(SUM(CAST(ROUND(l_extendedprice, 6) AS DECIMAL(18,6))))) * 1000000 AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS sum_base_price,
       (CAST(CAST(FLOOR(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6)))) AS BIGINT) AS DOUBLE) + CAST(CAST((SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))) - FLOOR(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))))) * 1000000 AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS sum_disc_price,
       (CAST(CAST(FLOOR(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS DECIMAL(18,6)))) AS BIGINT) AS DOUBLE) + CAST(CAST((SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS DECIMAL(18,6))) - FLOOR(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS DECIMAL(18,6))))) * 1000000 AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS sum_charge,
       (CAST(CAST(FLOOR(SUM(CAST(ROUND(l_quantity, 6) AS DECIMAL(18,6)))) AS BIGINT) AS DOUBLE) + CAST(CAST((SUM(CAST(ROUND(l_quantity, 6) AS DECIMAL(18,6))) - FLOOR(SUM(CAST(ROUND(l_quantity, 6) AS DECIMAL(18,6))))) * 1000000 AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE)) / COUNT(*) AS avg_qty,
       (CAST(CAST(FLOOR(SUM(CAST(ROUND(l_extendedprice, 6) AS DECIMAL(18,6)))) AS BIGINT) AS DOUBLE) + CAST(CAST((SUM(CAST(ROUND(l_extendedprice, 6) AS DECIMAL(18,6))) - FLOOR(SUM(CAST(ROUND(l_extendedprice, 6) AS DECIMAL(18,6))))) * 1000000 AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE)) / COUNT(*) AS avg_price,
       (CAST(CAST(FLOOR(SUM(CAST(ROUND(l_discount, 6) AS DECIMAL(18,6)))) AS BIGINT) AS DOUBLE) + CAST(CAST((SUM(CAST(ROUND(l_discount, 6) AS DECIMAL(18,6))) - FLOOR(SUM(CAST(ROUND(l_discount, 6) AS DECIMAL(18,6))))) * 1000000 AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE)) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

_Q_TPCH_Q3 = """
SELECT l_orderkey,
       (CAST(CAST(FLOOR(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6)))) AS BIGINT) AS DOUBLE) + CAST(CAST((SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))) - FLOOR(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))))) * 1000000 AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS revenue,
       CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1997-03-15'
  AND CAST(l_shipdate AS DATE) > DATE '1997-03-15'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, orderdate, l_orderkey
LIMIT 10
"""

_Q_TPCH_Q5 = """
SELECT n_name,
       (CAST(CAST(FLOOR(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6)))) AS BIGINT) AS DOUBLE) + CAST(CAST((SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))) - FLOOR(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))))) * 1000000 AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

_Q_TPCH_Q10 = """
SELECT c_custkey, c_name,
       (CAST(CAST(FLOOR(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6)))) AS BIGINT) AS DOUBLE) + CAST(CAST((SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))) - FLOOR(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))))) * 1000000 AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS revenue,
       CAST(ROUND(c_acctbal, 2) AS DOUBLE) AS c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(o_orderdate AS DATE) >= DATE '1997-10-01'
  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, ROUND(c_acctbal, 2), n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def _spread_view(spark: SparkSession, sf_dir: str, name: str, *cols: str) -> None:
    """Re-register one fixture view through catalog.spread(): identical rows
    (a repartition is row-preserving), but the per-row work a SQL text runs
    over the view — decimal partial sums, join probes — parallelizes out of
    the lone single-row-group scan task (guide §2; no-op at cluster scale).
    The SQL text itself stays byte-identical."""
    ensure_view(spark, name, spread(table(spark, sf_dir, name), *cols), "spread")


@query("sql_text_q1", oracle=_Q_TPCH_Q1, tags=("sql", "tpch", "api"))
def sql_text_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    # TPC-H Q1 is the pure scan→7-decimal-sum aggregate: the partial agg is
    # the whole query's CPU (same move as pricing_summary; A/B in
    # OPTIMIZATION_r11.md).
    _spread_view(spark, sf_dir, "lineitem", "l_orderkey")
    return spark.sql(_Q_TPCH_Q1)


@query("sql_text_q3", oracle=_Q_TPCH_Q3, tags=("sql", "tpch", "api", "limit"))
def sql_text_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_TPCH_Q3)


@query("sql_text_q5", oracle=_Q_TPCH_Q5, tags=("sql", "tpch", "api"))
def sql_text_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_TPCH_Q5)


@query("sql_text_q10", oracle=_Q_TPCH_Q10, tags=("sql", "tpch", "api", "limit"))
def sql_text_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_TPCH_Q10)


# ---------------------------------------------------------------------------
# Second SQL-text tranche: the Q4/Q12/Q14/Q19 shapes (EXISTS-count,
# conditional-count pivot, promo ratio, disjunctive OR-of-ANDs predicate)
# adapted to the fixture's columns (no l_shipmode/l_commitdate in the
# generated lineitem), still one dialect-shared string per query. Integer
# SUM(CASE ...) columns carry CAST(... AS BIGINT) inline — DuckDB returns
# HUGEINT for bare integer SUMs (the round-1 hash-fail class).
# ---------------------------------------------------------------------------
_Q_TPCH_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE)
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

_Q_TPCH_Q12 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""

_Q_TPCH_Q14 = """
SELECT 100.00
       * (CAST(CAST(FLOOR(SUM(CAST(ROUND(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END, 6) AS DECIMAL(18,6)))) AS BIGINT) AS DOUBLE) + CAST(CAST((SUM(CAST(ROUND(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END, 6) AS DECIMAL(18,6))) - FLOOR(SUM(CAST(ROUND(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END, 6) AS DECIMAL(18,6))))) * 1000000 AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE))
       / (CAST(CAST(FLOOR(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6)))) AS BIGINT) AS DOUBLE) + CAST(CAST((SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))) - FLOOR(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))))) * 1000000 AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE))
       AS promo_revenue_pct,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-10-01'
"""

_Q_TPCH_Q19 = """
SELECT (CAST(CAST(FLOOR(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6)))) AS BIGINT) AS DOUBLE) + CAST(CAST((SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))) - FLOOR(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))))) * 1000000 AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


@query("sql_text_q4", oracle=_Q_TPCH_Q4, tags=("sql", "tpch", "api", "exists"))
def sql_text_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_TPCH_Q4)


@query("sql_text_q12", oracle=_Q_TPCH_Q12, tags=("sql", "tpch", "api"))
def sql_text_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_TPCH_Q12)


@query("sql_text_q14", oracle=_Q_TPCH_Q14, tags=("sql", "tpch", "api"))
def sql_text_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_TPCH_Q14)


@query("sql_text_q19", oracle=_Q_TPCH_Q19, tags=("sql", "tpch", "api", "disjunctive"))
def sql_text_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    # The broadcast-probe + disjunctive predicate + decimal sum all fuse
    # into the lineitem scan stage — spread the view so they parallelize
    # (guide §2; A/B in OPTIMIZATION_r11.md).
    _spread_view(spark, sf_dir, "lineitem", "l_partkey")
    return spark.sql(_Q_TPCH_Q19)


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS (the general form behind CUBE/ROLLUP — tpcds q27/
# q36/q70 family): three chosen grains in ONE Expand+aggregate pass, with
# GROUPING() markers distinguishing them. Dialect note: Spark emits
# GROUPING() as TINYINT, DuckDB as BIGINT — CAST inline so the shared text
# hashes identically on both engines.
# ---------------------------------------------------------------------------
_Q_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       (CAST(CAST(FLOOR(SUM(CAST(ROUND(l_quantity, 6) AS DECIMAL(18,6)))) AS BIGINT) AS DOUBLE) + CAST(CAST((SUM(CAST(ROUND(l_quantity, 6) AS DECIMAL(18,6))) - FLOOR(SUM(CAST(ROUND(l_quantity, 6) AS DECIMAL(18,6))))) * 1000000 AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS sum_qty,
       COUNT(*) AS n,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
"""


@query("sql_text_grouping_sets", oracle=_Q_GROUPING_SETS, tags=("sql", "grouping-sets", "api"))
def sql_text_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_GROUPING_SETS)


# ---------------------------------------------------------------------------
# Correlated LATERAL subquery (top-N per group as the parser writes it):
# each nation row drives a correlated ordered-LIMIT probe. Spark decorrelates
# this into a ranked window under the hood — the plan is the same row_number
# top-k, but the LATERAL *syntax* is its own analyzer surface (Spark 3.2+,
# DuckDB-shared). LIMIT inside carries the unique o_orderkey tiebreak.
# ---------------------------------------------------------------------------
_Q_LATERAL = """
SELECT n.n_name, t.o_orderkey, t.o_totalprice
FROM nation n, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey % 25 = n.n_nationkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
"""


@query("sql_text_lateral", oracle=_Q_LATERAL, tags=("sql", "lateral", "topk-per-group", "api"))
def sql_text_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_LATERAL)


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4.0+ WITH RECURSIVE, DuckDB-shared): generate the
# January-2024 date spine by recursion and gap-fill daily event counts
# against it. Dialect pins: DATE + INTERVAL re-CAST to DATE (DuckDB
# promotes to TIMESTAMP), date_trunc CAST to DATE (Spark returns
# TIMESTAMP). The spine is bounded (31 rows) — recursion depth is fixed,
# independent of data volume; the events side is one map-side-combined
# day rollup.
# ---------------------------------------------------------------------------
_Q_RECURSIVE = """
WITH RECURSIVE spine(d) AS (
  SELECT DATE '2024-01-01'
  UNION ALL
  SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM spine WHERE d < DATE '2024-01-31'
), daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d, COUNT(*) AS n
  FROM events GROUP BY CAST(date_trunc('day', ts) AS DATE)
)
SELECT spine.d AS day, COALESCE(daily.n, 0) AS n_events
FROM spine LEFT JOIN daily ON spine.d = daily.d
"""


@query("sql_text_recursive", oracle=_Q_RECURSIVE, tags=("sql", "recursive-cte", "gapfill", "api"))
def sql_text_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_RECURSIVE)


# ---------------------------------------------------------------------------
# Third SQL-text tranche (VERDICT r3 item #4): the 13 remaining TPC-H
# shapes, run VERBATIM through spark.sql — the reference's actual execution
# path for its entire corpus (TPCDSQueryBenchmark.scala:88,100 over 131
# .sql files). Each twin executes the EXACT oracle string of its DataFrame
# counterpart in tpch_suite.py (byte-shared via the registry), so the
# hairiest parser shapes — Q21's EXISTS + NOT EXISTS chain, Q2's
# decorrelated MIN, Q11's scalar-subquery HAVING threshold, Q16's NOT IN,
# Q22's NOT EXISTS + scalar AVG — go through Spark's SQL parser/analyzer
# (RewritePredicateSubquery, scalar-subquery decorrelation) instead of the
# pre-decorrelated DataFrame form, and both paths share one oracle.
# ---------------------------------------------------------------------------
def _twin_oracle(name: str) -> str:
    from spark_cherry_shuffle_service_spark.operators import tpch_suite  # noqa: F401
    from spark_cherry_shuffle_service_spark.plans.registry import REGISTRY

    oracle = REGISTRY[name].oracle
    assert oracle is not None, name
    return oracle


_TPCH_SQL_TEXT_TWINS = {
    "sql_text_q2": "min_cost_supplier",
    "sql_text_q7": "volume_shipping",
    "sql_text_q8": "market_share",
    "sql_text_q9": "product_profit",
    "sql_text_q11": "important_parts",
    "sql_text_q13": "customer_distribution",
    "sql_text_q15": "top_supplier",
    "sql_text_q16": "supplier_part_counts",
    "sql_text_q17": "small_qty_revenue",
    "sql_text_q18": "large_volume_customers",
    "sql_text_q20": "promotion_candidates",
    "sql_text_q21": "waiting_suppliers",
    "sql_text_q22": "global_sales_opportunity",
}


# r12 (VERDICT item 8): per-twin spread-view keys — same row-preserving
# view re-registration as sql_text_q1/q19 (text stays byte-identical).
# q2: lineitem feeds TWO identical distinct(l_partkey,l_suppkey) branches
# (the decorrelated MIN); spreading on those keys moves each branch's
# distinct aggregation off the lone scan task (A/B-positive,
# OPTIMIZATION_r12.md). q21 was measured and REVERTED: its lineitem view
# feeds two BROADCAST builds, so the spread exchange taxes both broadcasts
# while the optimizer floats the semi-join below the repartition anyway —
# normalized ~1.5 vs 1.06 baseline across 4 interleaved pairs.
_TWIN_SPREAD_VIEWS: dict[str, tuple[tuple[str, tuple[str, ...]], ...]] = {
    "sql_text_q2": (("lineitem", ("l_partkey", "l_suppkey")),),
}


def _make_sql_text_twin(text_name: str, twin_name: str):
    sql_text = _twin_oracle(twin_name)
    spread_views = _TWIN_SPREAD_VIEWS.get(text_name, ())

    @query(
        text_name,
        oracle=sql_text,
        tags=("sql", "tpch", "api", "twin"),
        doc=f"Verbatim spark.sql execution of {twin_name}'s oracle text "
        f"(tpch_suite.py) — parser-path parity for the shape.",
    )
    def run(spark: SparkSession, sf_dir: str, _sql: str = sql_text) -> DataFrame:
        register_views(spark, sf_dir)
        for _view, _keys in spread_views:
            _spread_view(spark, sf_dir, _view, *_keys)
        return spark.sql(_sql)

    run.__name__ = text_name
    return run


for _text_name, _twin_name in _TPCH_SQL_TEXT_TWINS.items():
    _make_sql_text_twin(_text_name, _twin_name)


# ---------------------------------------------------------------------------
# tpcds/q88.sql shape: a single result row assembled by CROSS JOINING
# eight independent 1-row scalar-count subqueries (q88 counts store
# sales in eight half-hour bands and joins s1..s8). Analog: eight order
# totalprice bands over orders. Dialect-shared verbatim text — Spark
# plans eight parallel scans folded by broadcast-nested-loop joins of
# single rows (each side is one row, so the "cross join" is scalar
# composition, not a product); the efficient single-pass rewrite of
# this shape is conditional aggregation, already covered by
# `conditional_agg` — THIS query pins the multi-subquery parser form.
# ---------------------------------------------------------------------------
_Q_MULTISCALAR = """
SELECT b1.n AS band_00_25k, b2.n AS band_25_50k, b3.n AS band_50_75k,
       b4.n AS band_75_100k, b5.n AS band_100_150k, b6.n AS band_150_200k,
       b7.n AS band_200_300k, b8.n AS band_300k_up
FROM (SELECT COUNT(*) AS n FROM orders WHERE o_totalprice < 25000) b1,
     (SELECT COUNT(*) AS n FROM orders WHERE o_totalprice >= 25000 AND o_totalprice < 50000) b2,
     (SELECT COUNT(*) AS n FROM orders WHERE o_totalprice >= 50000 AND o_totalprice < 75000) b3,
     (SELECT COUNT(*) AS n FROM orders WHERE o_totalprice >= 75000 AND o_totalprice < 100000) b4,
     (SELECT COUNT(*) AS n FROM orders WHERE o_totalprice >= 100000 AND o_totalprice < 150000) b5,
     (SELECT COUNT(*) AS n FROM orders WHERE o_totalprice >= 150000 AND o_totalprice < 200000) b6,
     (SELECT COUNT(*) AS n FROM orders WHERE o_totalprice >= 200000 AND o_totalprice < 300000) b7,
     (SELECT COUNT(*) AS n FROM orders WHERE o_totalprice >= 300000) b8
"""


@query(
    "sql_text_multiscalar",
    oracle=_Q_MULTISCALAR,
    tags=("sql", "api", "scalar", "tpcds-q88-shape"),
)
def sql_text_multiscalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_MULTISCALAR)


# Parser-path INTERSECT — the TPC-DS q14a cross-channel shape (reference
# tpcds/q14a.sql:12,21 and q38.sql): a CTE INTERSECTing three channel
# SELECTs (part keys returned under all three l_returnflag channels in
# 1996-97), re-joined downstream into a brand rollup that is then
# filtered against a scalar-subquery mean (q14a's avg_sales compare).
# Revenue is emitted as exact BIGINT micro-units (sum of DECIMAL(18,6)
# is integral at 1e6 scale in both engines — the CLAUDE.md wide-decimal
# rule), and the above-mean filter is the integer cross-multiplication
# rev*n > total, so no division ever happens. VERDICT r6 item 3:
# INTERSECT previously ran only on the DataFrame path
# (windows_setops.py:235); this exercises it through spark.sql() text.
_Q_INTERSECT_CHANNELS = """
WITH cross_parts AS (
  SELECT p_partkey AS xk
  FROM part, (
    SELECT l_partkey AS pk FROM lineitem, orders
     WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
       AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
       AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
    INTERSECT
    SELECT l_partkey FROM lineitem, orders
     WHERE l_orderkey = o_orderkey AND l_returnflag = 'A'
       AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
       AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
    INTERSECT
    SELECT l_partkey FROM lineitem, orders
     WHERE l_orderkey = o_orderkey AND l_returnflag = 'N'
       AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
       AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
  ) x
  WHERE p_partkey = pk
), brand_rev AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6)
                       AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS rev_micros
  FROM lineitem, part, cross_parts
  WHERE l_partkey = p_partkey AND p_partkey = xk
  GROUP BY p_brand
)
SELECT p_brand, n_lines, rev_micros
FROM brand_rev
WHERE rev_micros * (SELECT COUNT(*) FROM brand_rev)
      > (SELECT SUM(rev_micros) FROM brand_rev)
ORDER BY p_brand
"""


@query(
    "sql_text_intersect_channels",
    oracle=_Q_INTERSECT_CHANNELS,
    tags=("sql", "intersect", "cte", "api"),
)
def sql_text_intersect_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_INTERSECT_CHANNELS)


# ---------------------------------------------------------------------------
# tpcds q70/q36 shape on the PARSER path: rank within rollup level —
# RANK() OVER (PARTITION BY lochierarchy, CASE WHEN ... END) over a
# GROUP BY ROLLUP with GROUPING() markers (tpcds/q70.sql:5-10). The
# DataFrame twin is `rollup_grouping` (relational.py); this runs the SAME
# dialect-shared text through spark.sql and DuckDB (dsum twin included).
# ---------------------------------------------------------------------------
from spark_cherry_shuffle_service_spark.plans.oracle import dsum_sql as _dsum_sql

_Q_ROLLUP_RANK = f"""
WITH r AS (
  SELECT COALESCE(r_name, '(all)') AS region_name,
         COALESCE(n_name, '(all)') AS nation_name,
         GROUPING(r_name) + GROUPING(n_name) AS lochierarchy,
         GROUPING(n_name) AS g_nation,
         {_dsum_sql('c_acctbal', 'total_bal')},
         COUNT(*) AS n_cust
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY ROLLUP(r_name, n_name)
)
SELECT region_name, nation_name, lochierarchy, total_bal, n_cust,
       RANK() OVER (PARTITION BY lochierarchy,
                                 CASE WHEN g_nation = 0 THEN region_name END
                    ORDER BY total_bal DESC, nation_name) AS rank_within_parent
FROM r
"""


@query(
    "sql_text_rollup_rank",
    oracle=_Q_ROLLUP_RANK,
    tags=("sql", "rollup", "grouping", "window", "api"),
)
def sql_text_rollup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q_ROLLUP_RANK)
