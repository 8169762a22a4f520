"""SQL-text API parity: the reference executes its entire TPC-DS corpus as
raw SQL strings via spark.sql(queryString) over registered temp views
(TPCDSQueryBenchmark.scala:88,100 + :71). This module exercises that exact
path — catalog registration + SQL text — with dialect-shared SQL that runs
verbatim on BOTH Spark and the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_cherry_shuffle_service_spark.plans.registry import query
from spark_cherry_shuffle_service_spark.sources.catalog import register_views

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
