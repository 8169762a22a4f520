"""TPC-H spine completion: the remaining Q2/Q4/Q6-Q13/Q15-Q22 analogs.

The reference's executable query surface is the TPC-DS corpus run verbatim
through ``spark.sql`` (/root/reference/spark-code/code/sql/core/src/test/
scala/org/apache/spark/sql/execution/benchmark/TPCDSQueryBenchmark.scala:88,100).
Together with relational.py (Q1/Q3/Q5/Q14 analogs) this module completes a
full 22-query TPC-H-shaped suite over the fixture schema, exercising every
join/subquery/aggregation pattern in SURVEY.md §2.3-2.4/§2.9: correlated
scalar subqueries (Q2/Q11/Q15/Q17/Q22), EXISTS/NOT-EXISTS chains (Q4/Q21/
Q22), IN-subqueries over grouped HAVING (Q18/Q20), NOT IN (Q16), disjunctive
OR-of-ANDs predicates (Q19), conditional join predicates inside OUTER joins
(Q13), and nation-pair / market-share multi-way join trees (Q7/Q8/Q9/Q10).

Adaptations to the fixture schema (FIXTURES.md — no partsupp table, no
l_commitdate/l_receiptdate/l_shipmode/c_phone columns):
- supplier×part relationships derive from DISTINCT (l_partkey, l_suppkey)
  pairs in lineitem (Q2/Q16/Q20);
- "late" lines are l_shipdate > o_orderdate + 60 days (Q4/Q12/Q21);
- Q22's country code is SUBSTRING(c_name, 15, 2) (c_phone absent) and its
  "no orders" predicate is "no URGENT orders" (every fixture customer has
  orders);
- Q9's supply cost is 0.4 * p_retailprice * l_quantity (partsupp absent).

Scale notes: explicit broadcast hints appear ONLY on sides whose size is
bounded independent of SF — nation/region (25/5 rows) and 1-row scalar
aggregates (Q15's MAX, Q11's threshold, Q22's AVG). Everything that scales
with SF (supplier, part, customer, and any filtered slice of them — a
region filter keeps 1/5 of suppliers at ANY scale) is left unhinted: at
fixture sizes Catalyst's autoBroadcastJoinThreshold still picks broadcast,
while at 100 TB AQE decides from runtime stats instead of being forced
into an OOM-ing broadcast by a hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_cherry_shuffle_service_spark.functions.aggregates import dec_to_double, davg, dsum, money
from spark_cherry_shuffle_service_spark.plans.oracle import davg_sql, dsum_sql
from spark_cherry_shuffle_service_spark.plans.registry import query
from spark_cherry_shuffle_service_spark.sources.catalog import table


def _d(col: str) -> F.Column:
    return F.to_date(F.col(col))


_REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q2 analog — minimum-cost supplier: per-part argmin via a grouped MIN joined
# back on equality (the classic decorrelation of TPC-H Q2's correlated MIN
# subquery). Supplier×part pairs come from lineitem (no partsupp table).
# ---------------------------------------------------------------------------
@query(
    "min_cost_supplier",
    oracle="""
    WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    eur AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    ps AS (
      SELECT pairs.l_partkey, eur.s_suppkey, eur.s_name, eur.s_acctbal, eur.n_name
      FROM pairs JOIN eur ON pairs.l_suppkey = eur.s_suppkey
    ),
    mn AS (SELECT l_partkey, MIN(s_acctbal) AS min_bal FROM ps GROUP BY l_partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM ps
    JOIN mn ON ps.l_partkey = mn.l_partkey AND ps.s_acctbal = mn.min_bal
    JOIN part ON ps.l_partkey = p_partkey
    WHERE p_size BETWEEN 20 AND 30 AND p_type = 'STANDARD'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 20
    """,
    tags=("tpch", "join", "subquery", "argmin"),
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    nat = F.broadcast(table(spark, sf_dir, "nation"))
    reg = F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    eur = (
        table(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = pairs.join(eur, pairs.l_suppkey == eur.s_suppkey).select(
        "l_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name"
    )
    mn = ps.groupBy(F.col("l_partkey").alias("m_partkey")).agg(F.min("s_acctbal").alias("min_bal"))
    prt = table(spark, sf_dir, "part").filter(
        F.col("p_size").between(20, 30) & (F.col("p_type") == "STANDARD")
    )
    return (
        ps.join(mn, (ps.l_partkey == mn.m_partkey) & (ps.s_acctbal == mn.min_bal))
        .join(prt, ps.l_partkey == prt.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q4 analog — order-priority checking: EXISTS over a theta-correlated
# lineitem probe (late line within the order) -> left_semi with a compound
# condition; the same rewrite Catalyst's RewritePredicateSubquery applies.
# ---------------------------------------------------------------------------
@query(
    "order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND CAST(l_shipdate AS DATE) > CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)
      )
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "semi", "subquery", "theta"),
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = table(spark, sf_dir, "orders").filter(
        (_d("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (_d("o_orderdate") < F.lit("1997-04-01").cast("date"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (ords.o_orderkey == li.l_orderkey) & (
        _d("l_shipdate") > F.date_add(_d("o_orderdate"), 30)
    )
    return (
        ords.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Q6 analog — forecasting revenue change: the pure scan→filter→scalar-agg
# query. Every predicate is parquet-pushable; the plan must be a single
# WholeStageCodegen scan with no shuffle beyond the final partial agg merge.
# ---------------------------------------------------------------------------
@query(
    "forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount', 'revenue')},
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "scan", "filter", "agg"),
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (_d("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (_d("l_shipdate") < F.lit("1998-01-01").cast("date"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q7 analog — volume shipping between two nations: double role of the nation
# dim (supplier's vs customer's), symmetric pair predicate, year breakdown.
# ---------------------------------------------------------------------------
@query(
    "volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {dsum_sql('volume', 'revenue')},
           COUNT(*) AS n_lines
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             {_REV} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join", "multiway"),
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = table(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    n1 = F.broadcast(nat.select(F.col("n_nationkey").alias("k1"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nat.select(F.col("n_nationkey").alias("k2"), F.col("n_name").alias("cust_nation")))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ords = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    # Nation filters applied to supplier/customer BEFORE the fact joins:
    # the filtered sides are 2/25ths of their tables, so the join prunes
    # early instead of carrying every line to a final filter.
    s2 = supp.join(n1, supp.s_nationkey == F.col("k1"))
    c2 = cust.join(n2, cust.c_nationkey == F.col("k2"))
    return (
        li.join(s2, li.l_suppkey == s2.s_suppkey)
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(c2, ords.o_custkey == c2.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(_rev(), "revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


# ---------------------------------------------------------------------------
# Q8 analog — national market share: ratio of conditional dsum over dsum per
# year (tpcds/q9-family conditional aggregation, SURVEY.md §2.4).
# ---------------------------------------------------------------------------
@query(
    "market_share",
    oracle=f"""
    SELECT o_year,
           ROUND({dsum_sql("CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END")}
                 / {dsum_sql('volume')}, 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             {_REV} AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("tpch", "join", "conditional_agg"),
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    prt = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    nat = F.broadcast(table(spark, sf_dir, "nation"))
    reg = F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA"))
    # American customers (region-filtered -> bounded fraction of customer).
    cust = (
        table(spark, sf_dir, "customer")
        .join(nat.select("n_nationkey", "n_regionkey"), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sk"),
    ).select("s_suppkey", "supp_nation")
    ords = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem")
    vol = _rev()
    return (
        li.join(prt, li.l_partkey == F.col("p_partkey"))
        .join(supp, li.l_suppkey == F.col("s_suppkey"))
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == F.col("c_custkey"), "left_semi")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                dec_to_double(F.sum(money(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0.0)))))
                / dec_to_double(F.sum(money(vol))),
                6,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 analog — product-type profit: LIKE filter on p_name, profit expression
# over joined columns, nation×year rollup. Supply cost is 0.4·p_retailprice
# per unit (no partsupp table in the fixtures).
# ---------------------------------------------------------------------------
@query(
    "product_profit",
    oracle=f"""
    SELECT nation, o_year, {dsum_sql('amount', 'sum_profit')}
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INT) AS o_year,
             {_REV} - 0.4 * p_retailprice * l_quantity AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("tpch", "join", "like"),
)
def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    prt = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(table(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    ords = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem")
    amount = _rev() - 0.4 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(prt, li.l_partkey == F.col("p_partkey"))
        .join(supp, li.l_suppkey == F.col("s_suppkey"))
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy(F.col("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(amount, "sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q10 analog — returned-item reporting: 4-way join, one-quarter window,
# returnflag filter, top-20 customers by lost revenue.
# ---------------------------------------------------------------------------
@query(
    "returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {dsum_sql(_REV, 'revenue')},
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE CAST(o_orderdate AS DATE) >= DATE '1997-07-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-10-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
)
def returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").join(
        F.broadcast(table(spark, sf_dir, "nation")), F.col("c_nationkey") == F.col("n_nationkey")
    )
    ords = table(spark, sf_dir, "orders").filter(
        (_d("o_orderdate") >= F.lit("1997-07-01").cast("date"))
        & (_d("o_orderdate") < F.lit("1997-10-01").cast("date"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q11 analog — important parts: per-part value share vs a global-total scalar
# subquery threshold (TPC-H Q11's HAVING > SUM(...)·fraction). The scalar is
# computed once and broadcast-crossed into the filter.
# ---------------------------------------------------------------------------
@query(
    "important_parts",
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey, {dsum_sql(_REV, 'part_value')}
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7')
      GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM pv
    WHERE part_value > (
      SELECT {dsum_sql(_REV)} * 0.002
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7')
    )
    ORDER BY part_value DESC, l_partkey
    """,
    tags=("tpch", "subquery", "scalar", "having"),
)
def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = F.broadcast(
        table(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").join(
        supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    pv = li.groupBy("l_partkey").agg(dsum(_rev(), "part_value"))
    total = li.agg((dsum(_rev(), "t")))
    threshold = total.select((F.col("t") * 0.002).alias("threshold"))
    return (
        pv.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q12 analog — shipping-priority classes: conditional counts of high/low
# priority orders among late-shipped lines, grouped by returnflag (the
# fixture's stand-in for l_shipmode).
# ---------------------------------------------------------------------------
@query(
    "late_line_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE CAST(l_shipdate AS DATE) > CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)
      AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
    GROUP BY l_returnflag
    """,
    tags=("tpch", "join", "conditional_agg", "theta"),
)
def late_line_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").filter(
        (_d("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (_d("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .filter(_d("l_shipdate") > F.date_add(_d("o_orderdate"), 30))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 analog — customer order-count distribution: LEFT JOIN with an extra
# predicate inside the join condition (not a post-filter — unmatched rows
# must survive), then a histogram of the grouped counts.
# ---------------------------------------------------------------------------
@query(
    "customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "outer", "join", "histogram"),
)
def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    ords = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    cond = (cust.c_custkey == ords.o_custkey) & (ords.o_orderpriority != "1-URGENT")
    return (
        cust.join(ords, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q15 analog — top supplier: revenue view + scalar MAX subquery equality
# (deterministic: dsum makes per-supplier revenue exact, MAX of exact values
# is exact, so the double-equality join is parallelism-safe).
# ---------------------------------------------------------------------------
@query(
    "top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {dsum_sql(_REV, 'total_revenue')}
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("tpch", "subquery", "scalar", "cte"),
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (_d("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (_d("l_shipdate") < F.lit("1997-04-01").cast("date"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(_rev(), "total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("max_rev"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 analog — supplier-part counts: COUNT(DISTINCT) over lineitem-derived
# part×supplier pairs, NOT IN exclusion subquery (non-null key set), value
# IN-list on p_size.
# ---------------------------------------------------------------------------
@query(
    "supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (5, 10, 15, 20, 25, 30)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "distinct", "not_in", "anti"),
)
def supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    prt = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30)
    )
    return (
        pairs.join(bad, pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(prt, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17 analog — small-quantity-order revenue: correlated per-part AVG
# threshold, decorrelated into a grouped-avg join (exactly what Catalyst
# does to the SQL form); scalar output divided by 7 for "avg yearly".
# ---------------------------------------------------------------------------
@query(
    "small_qty_revenue",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey AS a_partkey, {davg_sql('l_quantity', 'avg_qty')}
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa ON a_partkey = l_partkey
    WHERE p_brand IN ('Brand#3', 'Brand#4') AND p_type = 'SMALL'
      AND l_quantity < 0.2 * avg_qty
    """,
    tags=("tpch", "subquery", "correlated", "scalar"),
)
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(davg(F.col("l_quantity"), "avg_qty"))
    prt = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin("Brand#3", "Brand#4") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    return (
        li.join(prt, li.l_partkey == F.col("p_partkey"))
        .join(pa, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (dec_to_double(F.sum(money(F.col("l_extendedprice")))) / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q18 analog — large-volume customers: IN subquery over grouped HAVING
# (semi join against an aggregate), top-100 by totalprice.
# ---------------------------------------------------------------------------
@query(
    "large_volume_customers",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS odate, o_totalprice,
           {dsum_sql('l_quantity', 'total_qty')}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("tpch", "semi", "having", "topk"),
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # Integral-valued doubles sum exactly in any order — no dsum needed for
    # the HAVING threshold.
    big = (
        li.groupBy(F.col("l_orderkey").alias("b_orderkey"))
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("b_orderkey")
    )
    ords = table(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == F.col("b_orderkey"), "left_semi"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            _d("o_orderdate").alias("odate"),
            "o_totalprice",
        )
        .agg(dsum(F.col("l_quantity"), "total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 analog — discounted revenue: disjunctive OR-of-ANDs predicate spanning
# both join sides; Catalyst extracts the common p_partkey equi-key and keeps
# the disjunction as a residual filter.
# ---------------------------------------------------------------------------
@query(
    "discounted_revenue",
    oracle=f"""
    SELECT {dsum_sql(_REV, 'revenue')}, COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40 AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("tpch", "join", "disjunction"),
)
def discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    prt = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .select("p_partkey", "p_brand", "p_size")
    )
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & qty.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 25) & qty.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 40) & qty.between(20, 40))
    )
    return (
        li.join(prt, li.l_partkey == F.col("p_partkey"))
        .filter(cond)
        .agg(dsum(_rev(), "revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


# ---------------------------------------------------------------------------
# Q20 analog — promotion candidates: nested IN over a grouped-HAVING
# subquery (suppliers who moved >20 units of a 'red%' part in the window),
# region-scoped supplier output.
# ---------------------------------------------------------------------------
@query(
    "promotion_candidates",
    oracle="""
    SELECT s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
          AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 20
      )
    ORDER BY s_name
    """,
    tags=("tpch", "semi", "having", "like"),
)
def promotion_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    prt = table(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    movers = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (_d("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (_d("l_shipdate") < F.lit("1998-01-01").cast("date"))
        )
        .join(prt, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 20)
        .select("l_suppkey")
    )
    nat = F.broadcast(table(spark, sf_dir, "nation"))
    reg = F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        table(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(movers, F.col("s_suppkey") == movers.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal", "n_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q21 analog — suppliers who kept orders waiting: the EXISTS + NOT EXISTS
# chain over the same fact table. The oracle keeps the literal correlated
# form; the DataFrame plan rewrites both predicates into per-order MIN/MAX
# supplier stats — EXISTS(other supplier) ⇔ min≠max over the order's
# suppliers, NOT EXISTS(other LATE supplier) ⇔ min=max over its late
# suppliers (l1 itself is late, so the late set collapsing to one supplier
# is exactly "no other late") — which needs one fewer shuffle than the
# semi+anti pair-set rewrite and no distinct expansion (measured 2.5×
# faster at sf0.1; both equal the oracle).
# ---------------------------------------------------------------------------
@query(
    "waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND CAST(l1.l_shipdate AS DATE) > CAST(CAST(o_orderdate AS DATE) + INTERVAL 60 DAY AS DATE)
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND CAST(l3.l_shipdate AS DATE) > CAST(CAST(o_orderdate AS DATE) + INTERVAL 60 DAY AS DATE)
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
    tags=("tpch", "semi", "anti", "self"),
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    ords = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = li.join(ords, li.l_orderkey == ords.o_orderkey).filter(
        _d("l_shipdate") > F.date_add(_d("o_orderdate"), 60)
    )
    stats = li.groupBy(F.col("l_orderkey").alias("s_orderkey")).agg(
        F.min("l_suppkey").alias("mn"), F.max("l_suppkey").alias("mx")
    )
    # late is already hash-partitioned by l_orderkey after the orders join,
    # so this groupBy and both joins below reuse that exchange.
    late_stats = late.groupBy(F.col("l_orderkey").alias("t_orderkey")).agg(
        F.min("l_suppkey").alias("lmn"), F.max("l_suppkey").alias("lmx")
    )
    waiting = (
        late.join(stats, late.l_orderkey == F.col("s_orderkey"))
        .join(late_stats, late.l_orderkey == F.col("t_orderkey"))
        .filter((F.col("mn") != F.col("mx")) & (F.col("lmn") == F.col("lmx")))
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(supp, waiting.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Q22 analog — global sales opportunity: scalar AVG subquery threshold +
# NOT EXISTS anti join, grouped by a substring country code (c_phone absent:
# code = SUBSTRING(c_name, 15, 2); "no orders" adapted to "no URGENT orders"
# since every fixture customer has orders).
# ---------------------------------------------------------------------------
@query(
    "global_sales_opportunity",
    oracle=f"""
    SELECT SUBSTRING(c_name, 15, 2) AS cntrycode,
           COUNT(*) AS numcust,
           {dsum_sql('c_acctbal', 'totacctbal')}
    FROM customer
    WHERE c_acctbal > (
      SELECT {davg_sql('c_acctbal')} FROM customer WHERE c_acctbal > 0.0
    )
    AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    GROUP BY SUBSTRING(c_name, 15, 2)
    ORDER BY cntrycode
    """,
    tags=("tpch", "anti", "scalar", "substring"),
)
def global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(davg(F.col("c_acctbal"), "ab"))
    urgent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 15, 2).alias("cntrycode"))
        .agg(F.count(F.lit(1)).alias("numcust"), dsum(F.col("c_acctbal"), "totacctbal"))
        .orderBy("cntrycode")
    )
