"""Verbatim TPC-DS execution — the reference's ACTUAL benchmark surface.

The reference benchmarks by reading TPC-DS v1.4 .sql files and running
them through `spark.sql(queryString)` over parquet temp views
(/root/reference/spark-code/code/sql/core/src/test/scala/org/apache/spark/
sql/execution/benchmark/TPCDSQueryBenchmark.scala:69-100,120-137; its
headline pair is q2 + q5, /root/reference/README.md:125-126). This module
does literally that: each `sql_text_tpcds_*` query registers the star
slice (sources/tpcds_star.py) as temp views and executes the UNMODIFIED
text from operators/tpcds_texts.py.

Oracle strategy: the DuckDB oracle reads the SAME parquet the Spark side
wrote (read_parquet over /root/repo/.tpcds/sf0.01 — committed to the repo
so the grading driver can evaluate the oracle regardless of execution
order; plans/differential.py::adapt_oracle rewrites the tag when `compare`
runs at another SF). Two dialect-honest adaptations happen on the ORACLE
side only — the Spark text stays verbatim:

- Output columns are re-aliased positionally (`AS tpcds_result(<spark
  names>)`) because unaliased expressions get engine-specific auto-names
  and the driver hashes by sorted column name. tests/test_tpcds.py pins
  the recorded Spark names against live df.columns.
- q2's `round(x/y, 2)` ratios are computed in exact HUGEINT fixed-point
  (`(a*200 + b) // (2b)` over cents = HALF_UP at 2dp): DuckDB divides
  DECIMALs in binary DOUBLE where Spark divides exactly in DECIMAL, the
  documented ROUND-tie class (CLAUDE.md). Spark's own double-rounding
  (scale-20 quotient, then 2dp) equals direct HALF_UP for every
  denominator below ~1e18 cents, so the integer form matches it exactly.

Result-stability audit (the LIMIT/tiebreak hard rule, applied to texts we
cannot edit). SINCE ROUND 11 THIS AUDIT IS MECHANIZED: limit_boundary_probe
(+ boundary_key_funcs) below runs every trailing-LIMIT text un-LIMITed in
its own sort order and proves the cut unambiguous — sub-LIMIT, strictly
unequal ORDER-BY keys at positions n-1/n, or an identical-row tie group —
enforced per SF (sf0.01, sf0.1, generated ~sf1) by
tests/test_tpcds.py::test_limit_boundary_is_tie_free. The per-batch prose
below is the HISTORY of the manual audit (why each query was admitted,
and the oracle-side arithmetic rewrites, which remain normative); its
"residual boundary-tie exposure" claims (q56/q79/q89/q46-class) are now
probed mechanically every gate run instead of argued. Every LIMITed
query either orders by a key chain that is
unique per output row (q3/q10/q15/q19/q26/q45/q52/q55/q60/q68/q7: the
full group key or a unique ticket/zip appears in the ORDER BY) or cannot
reach its LIMIT (q5: 3 channels x {12 stores, 20 pages, 12 sites} +
rollup rows = 48 < 100 by dimension-size construction; q33: <= 100
Electronics manufacts by the manufact<->category congruence in
gen_item; q42: <= 10 categories; q43: <= 12 stores; q88/q96: single
row). q2/q34/q73 carry no LIMIT and the differential is
order-insensitive. Two queries carry a RESIDUAL boundary-tie exposure
when their result exceeds the LIMIT: q56 (ORDER BY a decimal sum —
a rank-100 boundary tie needs two single-sale items with identical
qty x price, ~3e-6 on these fixtures) and q79 (ORDER BY name/city/
profit without the ticket — needs a full name+city+exact-profit
collision at the boundary, ~1e-7); both are dialect-identical exact
DECIMAL comparisons, so any tie would still order identically unless it
straddles rank 100 exactly.

Round-9 batch (q14a q16 q21 q22 q38 q44 q51 q53 q63 q67 q70 q72 q87 q89
q95) audit: q16/q38/q44/q87/q95 are single-row or sub-LIMIT
(q44: <= ~10 ranks x tie multiplicity, <100); q51 orders by the unique
FULL-OUTER key (item_sk, d_date); q72 orders by its full group key;
q21 (<= ~12 price-band items x 3 warehouses < 100) and q53/q63
(planted-manufact groups, < 100 rows) stay under their LIMITs by
construction; q70 (<= 12 stores' state/county rollup, ~25 rows) never
reaches LIMIT; q22/q67/q14a order rollup labels, so the oracle pins
Spark's ASC NULLS FIRST; q67's full 8-column label chain is unique per
grouping-set row; q89 carries the q56-class residual (ORDER BY an exact
decimal difference at the rank-100 boundary). q53/q63/q89's
`abs(sum-avg)/avg > 0.1` threshold divides exact decimals — Spark
compares an exact-decimal quotient, DuckDB a correctly-rounded double
quotient of the SAME exact operands, so divergence needs the true ratio
inside the ~5.5e-18-wide window between the two roundings of 0.1 (the
documented residual class, same as q56/q79).

Batch-4 audit (q37 q40 q62 q82 q84 q90 q93 q94 q99 — the queries that
make the v4 dims load-bearing): q90/q94 single-row; q37/q82 order by
unique i_item_id (GROUP BY collapses duplicates) and stay sub-LIMIT
(two price-band items each at sf0.01, growing with SF); q40/q93 order
by their full group key; q62/q99 (3x5x{4,12} bucket groups < 100 rows)
and q84 (ties at the LIMIT boundary are between IDENTICAL rows — the
customer_id/name pair repeats once per matching return, so any
100-subset is the same multiset). q62/q99's BIGINT casts, q90's exact
scale-20 ratio and the backtick-alias conversion are oracle-side only.

Batch-5 audit (q6 q9 q13 q25 q28 q29 q30 q32 q35 q46 q48 q50 q66 q71
q81 q92 q97 — the rest of the v1.4 set that runs non-empty on the
committed fixtures with no new generator plants): q9/q13/q28/q48/q97
are single-row; q32 emits the literal 1 per matching row, so any
LIMIT-100 subset is the same multiset; q92 aggregates to one row.
q25/q29 order by their full group key (unique per row); q30/q81 order
by the full output row including the unique c_customer_id; q35 orders
by its complete 6-column group key (LIMIT binds at 100 — key chain
unique per row); q50 groups/orders by the store row (<= 12 stores);
q66 orders by w_warehouse_name (warehouse count stays far below 100);
q6 (<= ~50 states after HAVING cnt>=10) and q71 carries no LIMIT
(order-insensitive differential). q46 orders by name/city/ticket — a
ticket with two addr rows could tie at the boundary only on identical
(name, city, bought_city, ticket), the q56-class residual. Oracle-side
exact-arithmetic rewrites (Spark text verbatim): exact HALF_UP avg for
q13/q28/q9 outputs and the q30/q81 (*1.2) and q32/q92/q6 (*1.3, *1.2)
correlated thresholds; q66's twelve sales-per-sq-foot columns divide
DECIMAL(28,2) by int at Spark's derived scale 12 in HUGEINT
fixed-point; BIGINT casts on integer sums (q29/q48/q50/q97).

Batch-6 audit (q4 q11 q12 q18 q20 q23a q31 q59 q61 q74 q77 q80 q98 —
the exact-decimal-ratio family): Spark rounds every decimal quotient
HALF_UP at its type-derived scale while DuckDB divides in binary
double, so each division site is rewritten to the HUGEINT count form
(_ratio_counts / _ratio_dec): q12/q20/q98's revenueratio (scale 17),
q59's seven week-over-week ratios and q31's four quarter-over-quarter
ratios (scale 20, count-compared in q31's WHERE since both sides share
the scale), q61's promo ratio (scale-20 quotient, then *100 as an
exact shift to (38,19)), q11/q74's year-over-year growth comparisons
(scale 20), and q4's (scale 14 over scale-6 sums, whose per-row
half-profit division is itself rounded at scale 6 before summing).
q18 reuses the q18a sign-safe exact-avg + rollup NULLS FIRST
treatment; q23a's (50/100.0)* threshold becomes the exact DECIMAL
literal 0.5*. LIMIT stability: q4/q74 order by the unique customer_id
(one year_total row per customer at fixed year+type); q11's only
output column IS its sort key (boundary ties are identical rows);
q12/q20 order by (category, class, i_item_id, ...) with i_item_id
unique per item row (generator invariant, pinned below); q59 orders by
the unique (store, week) chain; q18/q77/q80 rollup key chains are
unique per grouping-set row (NULLS FIRST pinned); q23a/q61 are
single-row; q31/q98 carry no LIMIT.

Batch-7 audit (q47 q57 q86): q47/q57 join the q53/q63/q89 windowed
exact-avg family (store / call-center grain) and inherit both of that
family's documented residuals — the abs(sum-avg)/avg > 0.1 threshold
and the ORDER BY (sum_sales - avg_monthly_sales, name) boundary, both
exact-decimal comparisons that diverge only inside the ~5.5e-18 double-
rounding window (boundary probed tie-free at sf0.01/sf0.1). q86
follows the q70 rollup-rank shape verbatim (rank ties need exact-equal
decimal sums at the boundary; probed tie-free both SFs, 108 rows).
q75 was registered in this batch and then REMOVED: it orders by
sales_cnt_diff — an integer count difference — under LIMIT 100, and on
the v9 star at sf0.1 the rank-100 boundary lands inside a tie group
(measured live: Spark's bound subset differed across sessions at
diff = -180 while DuckDB's stayed fixed — a real engine-ambiguous
result, the q65-class failure but intrinsic to the query's sort key
rather than fixable with a generator plant). q65 itself joined batch 8
once star v9 made i_item_desc unique per item.

Batch-8 audit (q1 q8 q23b q24a q24b q27 q36 q41 q49 q54 q58 q65 q69
q76 q78 q83 q91 — the star-v9-unlocked set; every predicate these
probe is planted by construction, sources/tpcds_star.py v9 note):
single-column-output queries (q1, q41) are multiset-stable at any
LIMIT (the sort key IS the row); q8 groups by <= 12 stores; q27 pins
rollup NULLS FIRST with a unique (item, state) chain; q36 follows the
q86 rollup-rank shape with the gross-margin quotient rewritten to
scale-20 counts in BOTH the select and the rank ORDER BY (identical
tie structure); q49 stays far under LIMIT (<= ~20 rank-10 rows per
channel after UNION dedup); q54's segment is unique per row; q58/q83
order by the unique item_id; q65's (store, desc) chain is unique now
that v9 descs are; q69/q76/q78 order by their full group keys. Exact
forms: q1 joins the q30/q81 avg*1.2 family, q23b the q23a 0.5*
threshold, q24a/b an exact 0.05*avg, q27 the q7-style avg ladder, q54
mirrors Spark's divide-round-then-truncate segment, q58 mirrors the
three-step HALF_UP chain (scale 21, 21, 17) per dev column plus the
scale-6 average, q65 the exact avg threshold, q78 the int-ratio
ROUND as exact-rational HALF_UP cast to DOUBLE, q83 BIGINT quantity
casts (its dev ratios are bigint/bigint -> IEEE double in BOTH
engines, bit-identical with no rewrite) and an exact scale-6 average.

Batch-9 audit (the v2.7 structural variants): 15 twins of registered
v1.4 queries run under `<q>_v27` keys (V27_RENAMES) and inherit their
siblings' oracle rewrites through base-name dispatch — the anchored
assert counts caught every shape drift (q14a's avg spacing and ORDER
layout, q49's uppercase web-channel ratios, q78's commented-out ORDER
expression) and those sites are version-keyed. 7 new union-of-levels
forms: q36a mirrors its THREE gross-margin scales (base level derived
scale 20 then UNION-coerced to the rollup levels' native (38,11) —
one extra HALF_UP — vs scale 11 direct for levels 1-2); q51a orders
by the unique (item_sk, d_date); q67a/q77a/q80a pin union NULL labels
NULLS FIRST under their binding LIMITs; q70a/q86a rank over exact
decimal sums (q86 argument). v2.7 q22a and q27a are deliberately NOT
registered: both RE-AVERAGE a double (avg of avg(int) columns), and
Spark merges double partial aggregates in shuffle-fetch order — the
low-order bits are not parallelism-deterministic, the q17/q39 stddev
exclusion class. v2.7 q14/q64 share the duplicate-output-name
exclusion; v2.7 q75 carries the same engine-ambiguous integer-diff
LIMIT boundary that removed v1.4 q75.

Round-10 (star v10): the two fixture-density exclusions are CLOSED —
q85 runs verbatim over cohort J (tk%31==5: year-2000 web returns
cycling all three marital/education x price-band x state/profit-band
disjuncts; see sources/tpcds_star.py v10 note) and v2.7 q24 (key
q24_v27) over cohort K (store-8 pale-item returns for customers whose
own address carries the store's zip). 124 of 135 shipped files now run
verbatim; every remaining exclusion is driver-protocol-impossible, not
fixture debt.

q64 is deliberately NOT registered despite its v9 plants (purple
70.00 items with sale+return pairs in both 1999 and 2000 now make it
return 10 rows): both the v1.4 and v2.7 texts SELECT cs1.s1..s3 AND
cs2.s1..s3 — duplicate output column names, which the driver's
sorted-by-name value hash cannot key deterministically (the q14b
exclusion class; Spark's Row[name] reads only the first duplicate).

Deliberately NOT registered (and why): q14b's `SELECT *` over a
this_year/last_year self-join emits DUPLICATE column names
(sales/number_sales twice), which the driver's sorted-by-column-name
value hash cannot key deterministically — q14a covers the same
cross_items INTERSECT + avg_sales CTE machinery with unique names.
q17/q39a/q39b output RAW stddev_samp doubles: Spark's CentralMomentAgg
merges per-partition (n, avg, m2) states in shuffle-fetch order, so the
low-order bits of an unrounded stddev are not parallelism-deterministic
— no oracle can be bit-stable by construction (the engine's own
stddev surface, agg_stddev, pins the operator with a 4dp round; the
inventory stddev SHAPE is covered there and by q21/q22's inventory
aggregations).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from spark_cherry_shuffle_service_spark.operators.tpcds_texts import TPCDS_TEXTS
from spark_cherry_shuffle_service_spark.plans.registry import query
from spark_cherry_shuffle_service_spark.sources.tpcds_star import (
    ORACLE_TAG,
    STAR_ROOT,
    TPCDS_TABLES,
    register_star_views,
)

#: Spark 4.1 output column names per query, captured from live runs and
#: pinned by tests/test_tpcds.py::test_spark_output_columns_match_pinned.
#: The oracle wrapper re-aliases DuckDB's output to these names
#: positionally, so the driver's sorted-by-name hash compares apples to
#: apples even for unaliased expressions.
SPARK_COLS: dict[str, tuple[str, ...]] = {
    "q2": (
        "d_week_seq1",
        "round((sun_sales1 / sun_sales2), 2)",
        "round((mon_sales1 / mon_sales2), 2)",
        "round((tue_sales1 / tue_sales2), 2)",
        "round((wed_sales1 / wed_sales2), 2)",
        "round((thu_sales1 / thu_sales2), 2)",
        "round((fri_sales1 / fri_sales2), 2)",
        "round((sat_sales1 / sat_sales2), 2)",
    ),
    "q3": ("d_year", "brand_id", "brand", "sum_agg"),
    "q5": ("channel", "id", "sales", "returns", "profit"),
    "q7": ("i_item_id", "agg1", "agg2", "agg3", "agg4"),
    "q15": ("ca_zip", "sum(cs_sales_price)"),
    "q19": ("brand_id", "brand", "i_manufact_id", "i_manufact", "ext_price"),
    "q34": (
        "c_last_name",
        "c_first_name",
        "c_salutation",
        "c_preferred_cust_flag",
        "ss_ticket_number",
        "cnt",
    ),
    "q42": ("d_year", "i_category_id", "i_category", "sum(ss_ext_sales_price)"),
    "q43": (
        "s_store_name",
        "s_store_id",
        "sun_sales",
        "mon_sales",
        "tue_sales",
        "wed_sales",
        "thu_sales",
        "fri_sales",
        "sat_sales",
    ),
    "q45": ("ca_zip", "ca_city", "sum(ws_sales_price)"),
    "q52": ("d_year", "brand_id", "brand", "ext_price"),
    "q55": ("brand_id", "brand", "ext_price"),
    "q68": (
        "c_last_name",
        "c_first_name",
        "ca_city",
        "bought_city",
        "ss_ticket_number",
        "extended_price",
        "extended_tax",
        "list_price",
    ),
    "q73": (
        "c_last_name",
        "c_first_name",
        "c_salutation",
        "c_preferred_cust_flag",
        "ss_ticket_number",
        "cnt",
    ),
    "q88": (
        "h8_30_to_9",
        "h9_to_9_30",
        "h9_30_to_10",
        "h10_to_10_30",
        "h10_30_to_11",
        "h11_to_11_30",
        "h11_30_to_12",
        "h12_to_12_30",
    ),
    "q96": ("count(1)",),
    "q10": (
        "cd_gender",
        "cd_marital_status",
        "cd_education_status",
        "cnt1",
        "cd_purchase_estimate",
        "cnt2",
        "cd_credit_rating",
        "cnt3",
        "cd_dep_count",
        "cnt4",
        "cd_dep_employed_count",
        "cnt5",
        "cd_dep_college_count",
        "cnt6",
    ),
    "q26": ("i_item_id", "agg1", "agg2", "agg3", "agg4"),
    "q33": ("i_manufact_id", "total_sales"),
    "q56": ("i_item_id", "total_sales"),
    "q60": ("i_item_id", "total_sales"),
    "q79": (
        "c_last_name",
        "c_first_name",
        "substr(s_city, 1, 30)",
        "ss_ticket_number",
        "amt",
        "profit",
    ),
    # --- round-9 batch 3 + the inventory/warehouse/call_center unlock ---
    "q14a": ("channel", "i_brand_id", "i_class_id", "i_category_id", "sum(sales)", "sum(number_sales)"),
    "q16": ("order count ", "total shipping cost ", "total net profit "),
    "q21": ("w_warehouse_name", "i_item_id", "inv_before", "inv_after"),
    "q22": ("i_product_name", "i_brand", "i_class", "i_category", "qoh"),
    "q38": ("count(1)",),
    "q44": ("rnk", "best_performing", "worst_performing"),
    "q51": ("item_sk", "d_date", "web_sales", "store_sales", "web_cumulative", "store_cumulative"),
    "q53": ("i_manufact_id", "sum_sales", "avg_quarterly_sales"),
    "q63": ("i_manager_id", "sum_sales", "avg_monthly_sales"),
    "q67": (
        "i_category",
        "i_class",
        "i_brand",
        "i_product_name",
        "d_year",
        "d_qoy",
        "d_moy",
        "s_store_id",
        "sumsales",
        "rk",
    ),
    "q70": ("total_sum", "s_state", "s_county", "lochierarchy", "rank_within_parent"),
    "q72": ("i_item_desc", "w_warehouse_name", "d_week_seq", "no_promo", "promo", "total_cnt"),
    "q87": ("count(1)",),
    "q89": (
        "i_category",
        "i_class",
        "i_brand",
        "s_store_name",
        "s_company_name",
        "d_moy",
        "sum_sales",
        "avg_monthly_sales",
    ),
    "q95": ("order count ", "total shipping cost ", "total net profit "),
    # --- TPC-DS v2.7 variants (tpcds-v2.7.0/*.sql), run verbatim too ---
    "q5a": ("channel", "id", "sales", "returns", "profit"),
    "q10a": (
        "cd_gender",
        "cd_marital_status",
        "cd_education_status",
        "cnt1",
        "cd_purchase_estimate",
        "cnt2",
        "cd_credit_rating",
        "cnt3",
        "cd_dep_count",
        "cnt4",
        "cd_dep_employed_count",
        "cnt5",
        "cd_dep_college_count",
        "cnt6",
    ),
    "q18a": (
        "i_item_id",
        "ca_country",
        "ca_state",
        "ca_county",
        "agg1",
        "agg2",
        "agg3",
        "agg4",
        "agg5",
        "agg6",
        "agg7",
    ),
    "q35a": (
        "ca_state",
        "cd_gender",
        "cd_marital_status",
        "cd_dep_count",
        "cnt1",
        "avg(cd_dep_count)",
        "max(cd_dep_count)",
        "sum(cd_dep_count)",
        "cd_dep_employed_count",
        "cnt2",
        "avg(cd_dep_employed_count)",
        "max(cd_dep_employed_count)",
        "sum(cd_dep_employed_count)",
        "cd_dep_college_count",
        "cnt3",
        "avg(cd_dep_college_count)",
        "max(cd_dep_college_count)",
        "sum(cd_dep_college_count)",
    ),
    # --- round-9 batch 4: new-dim queries (inventory price bands,
    # ship-mode day buckets, web_page am/pm ratio, income_band, reason) ---
    "q37": ("i_item_id", "i_item_desc", "i_current_price"),
    "q40": ("w_state", "i_item_id", "sales_before", "sales_after"),
    "q62": (
        "substr(w_warehouse_name, 1, 20)",
        "sm_type",
        "web_name",
        "30 days ",
        "31 - 60 days ",
        "61 - 90 days ",
        "91 - 120 days ",
        ">120 days ",
    ),
    "q82": ("i_item_id", "i_item_desc", "i_current_price"),
    "q84": ("customer_id", "customername"),
    "q90": ("am_pm_ratio",),
    "q93": ("ss_customer_sk", "sumsales"),
    "q94": ("order count ", "total shipping cost ", "total net profit "),
    "q99": (
        "substr(w_warehouse_name, 1, 20)",
        "sm_type",
        "cc_name",
        "30 days ",
        "31 - 60 days ",
        "61 - 90 days ",
        "91 - 120 days ",
        ">120 days ",
    ),
    # --- round-9 batch 5: the remaining v1.4 queries that run non-empty
    # on the committed star fixtures without new generator plants ---
    "q6": ("state", "cnt"),
    "q9": ("bucket1", "bucket2", "bucket3", "bucket4", "bucket5"),
    "q13": (
        "avg(ss_quantity)",
        "avg(ss_ext_sales_price)",
        "avg(ss_ext_wholesale_cost)",
        "sum(ss_ext_wholesale_cost)",
    ),
    "q25": (
        "i_item_id",
        "i_item_desc",
        "s_store_id",
        "s_store_name",
        "store_sales_profit",
        "store_returns_loss",
        "catalog_sales_profit",
    ),
    "q28": (
        "B1_LP", "B1_CNT", "B1_CNTD",
        "B2_LP", "B2_CNT", "B2_CNTD",
        "B3_LP", "B3_CNT", "B3_CNTD",
        "B4_LP", "B4_CNT", "B4_CNTD",
        "B5_LP", "B5_CNT", "B5_CNTD",
        "B6_LP", "B6_CNT", "B6_CNTD",
    ),
    "q29": (
        "i_item_id",
        "i_item_desc",
        "s_store_id",
        "s_store_name",
        "store_sales_quantity",
        "store_returns_quantity",
        "catalog_sales_quantity",
    ),
    "q30": (
        "c_customer_id",
        "c_salutation",
        "c_first_name",
        "c_last_name",
        "c_preferred_cust_flag",
        "c_birth_day",
        "c_birth_month",
        "c_birth_year",
        "c_birth_country",
        "c_login",
        "c_email_address",
        "c_last_review_date",
        "ctr_total_return",
    ),
    "q32": ("excess discount amount ",),
    "q35": (
        "ca_state",
        "cd_gender",
        "cd_marital_status",
        "cnt1",
        "min(cd_dep_count)",
        "max(cd_dep_count)",
        "avg(cd_dep_count)",
        "cd_dep_employed_count",
        "cnt2",
        "min(cd_dep_employed_count)",
        "max(cd_dep_employed_count)",
        "avg(cd_dep_employed_count)",
        "cd_dep_college_count",
        "cnt3",
        "min(cd_dep_college_count)",
        "max(cd_dep_college_count)",
        "avg(cd_dep_college_count)",
    ),
    "q46": (
        "c_last_name",
        "c_first_name",
        "ca_city",
        "bought_city",
        "ss_ticket_number",
        "amt",
        "profit",
    ),
    "q48": ("sum(ss_quantity)",),
    "q50": (
        "s_store_name",
        "s_company_id",
        "s_street_number",
        "s_street_name",
        "s_street_type",
        "s_suite_number",
        "s_city",
        "s_county",
        "s_state",
        "s_zip",
        "30 days ",
        "31 - 60 days ",
        "61 - 90 days ",
        "91 - 120 days ",
        ">120 days ",
    ),
    "q66": (
        "w_warehouse_name", "w_warehouse_sq_ft", "w_city", "w_county",
        "w_state", "w_country", "ship_carriers", "year",
        "jan_sales", "feb_sales", "mar_sales", "apr_sales", "may_sales",
        "jun_sales", "jul_sales", "aug_sales", "sep_sales", "oct_sales",
        "nov_sales", "dec_sales",
        "jan_sales_per_sq_foot", "feb_sales_per_sq_foot",
        "mar_sales_per_sq_foot", "apr_sales_per_sq_foot",
        "may_sales_per_sq_foot", "jun_sales_per_sq_foot",
        "jul_sales_per_sq_foot", "aug_sales_per_sq_foot",
        "sep_sales_per_sq_foot", "oct_sales_per_sq_foot",
        "nov_sales_per_sq_foot", "dec_sales_per_sq_foot",
        "jan_net", "feb_net", "mar_net", "apr_net", "may_net", "jun_net",
        "jul_net", "aug_net", "sep_net", "oct_net", "nov_net", "dec_net",
    ),
    "q71": ("brand_id", "brand", "t_hour", "t_minute", "ext_price"),
    "q81": (
        "c_customer_id",
        "c_salutation",
        "c_first_name",
        "c_last_name",
        "ca_street_number",
        "ca_street_name",
        "ca_street_type",
        "ca_suite_number",
        "ca_city",
        "ca_county",
        "ca_state",
        "ca_zip",
        "ca_country",
        "ca_gmt_offset",
        "ca_location_type",
        "ctr_total_return",
    ),
    "q92": ("Excess Discount Amount ",),
    "q97": ("store_only", "catalog_only", "store_and_catalog"),
    # --- round-9 batch 6: the exact-decimal-ratio family ---
    "q4": (
        "customer_id",
        "customer_first_name",
        "customer_last_name",
        "customer_preferred_cust_flag",
        "customer_birth_country",
        "customer_login",
        "customer_email_address",
    ),
    "q11": ("customer_preferred_cust_flag",),
    "q12": (
        "i_item_desc",
        "i_category",
        "i_class",
        "i_current_price",
        "itemrevenue",
        "revenueratio",
    ),
    "q18": (
        "i_item_id",
        "ca_country",
        "ca_state",
        "ca_county",
        "agg1",
        "agg2",
        "agg3",
        "agg4",
        "agg5",
        "agg6",
        "agg7",
    ),
    "q20": (
        "i_item_desc",
        "i_category",
        "i_class",
        "i_current_price",
        "itemrevenue",
        "revenueratio",
    ),
    "q23a": ("sum(sales)",),
    "q31": (
        "ca_county",
        "d_year",
        "web_q1_q2_increase",
        "store_q1_q2_increase",
        "web_q2_q3_increase",
        "store_q2_q3_increase",
    ),
    "q59": (
        "s_store_name1",
        "s_store_id1",
        "d_week_seq1",
        "(sun_sales1 / sun_sales2)",
        "(mon_sales1 / mon_sales2)",
        "(tue_sales1 / tue_sales2)",
        "(wed_sales1 / wed_sales2)",
        "(thu_sales1 / thu_sales2)",
        "(fri_sales1 / fri_sales2)",
        "(sat_sales1 / sat_sales2)",
    ),
    "q61": (
        "promotions",
        "total",
        "((CAST(promotions AS DECIMAL(15,4)) / CAST(total AS DECIMAL(15,4))) * 100)",
    ),
    "q74": ("customer_id", "customer_first_name", "customer_last_name"),
    "q77": ("channel", "id", "sales", "returns", "profit"),
    "q80": ("channel", "id", "sales", "returns", "profit"),
    "q98": (
        "i_item_desc",
        "i_category",
        "i_class",
        "i_current_price",
        "itemrevenue",
        "revenueratio",
    ),
    # --- round-9 batch 7: the rank-vs-window-avg / rollup-rank family ---
    "q47": (
        "i_category",
        "i_brand",
        "s_store_name",
        "s_company_name",
        "d_year",
        "d_moy",
        "avg_monthly_sales",
        "sum_sales",
        "psum",
        "nsum",
    ),
    "q57": (
        "i_category",
        "i_brand",
        "cc_name",
        "d_year",
        "d_moy",
        "avg_monthly_sales",
        "sum_sales",
        "psum",
        "nsum",
    ),
    "q86": (
        "total_sum",
        "i_category",
        "i_class",
        "lochierarchy",
        "rank_within_parent",
    ),
    # --- round-9 batch 8: the star-v9-unlocked queries ---
    "q1": ("c_customer_id",),
    "q8": ("s_store_name", "sum(ss_net_profit)"),
    "q23b": ("c_last_name", "c_first_name", "sales"),
    "q24a": ("c_last_name", "c_first_name", "s_store_name", "paid"),
    "q24b": ("c_last_name", "c_first_name", "s_store_name", "paid"),
    # --- round-10 (star v10 plants): the last two plantable exclusions ---
    "q24_v27": ("c_last_name", "c_first_name", "s_store_name", "paid"),
    "q85": (
        "substr(r_reason_desc, 1, 20)",
        "avg(ws_quantity)",
        "avg(wr_refunded_cash)",
        "avg(wr_fee)",
    ),
    "q27": ("i_item_id", "s_state", "g_state", "agg1", "agg2", "agg3", "agg4"),
    "q36": (
        "gross_margin",
        "i_category",
        "i_class",
        "lochierarchy",
        "rank_within_parent",
    ),
    "q41": ("i_product_name",),
    "q49": ("channel", "item", "return_ratio", "return_rank", "currency_rank"),
    "q54": ("segment", "num_customers", "segment_base"),
    "q58": (
        "item_id",
        "ss_item_rev",
        "ss_dev",
        "cs_item_rev",
        "cs_dev",
        "ws_item_rev",
        "ws_dev",
        "average",
    ),
    "q65": (
        "s_store_name",
        "i_item_desc",
        "revenue",
        "i_current_price",
        "i_wholesale_cost",
        "i_brand",
    ),
    "q69": (
        "cd_gender",
        "cd_marital_status",
        "cd_education_status",
        "cnt1",
        "cd_purchase_estimate",
        "cnt2",
        "cd_credit_rating",
        "cnt3",
    ),
    "q76": (
        "channel",
        "col_name",
        "d_year",
        "d_qoy",
        "i_category",
        "sales_cnt",
        "sales_amt",
    ),
    "q78": (
        "ratio",
        "store_qty",
        "store_wholesale_cost",
        "store_sales_price",
        "other_chan_qty",
        "other_chan_wholesale_cost",
        "other_chan_sales_price",
    ),
    "q83": (
        "item_id",
        "sr_item_qty",
        "sr_dev",
        "cr_item_qty",
        "cr_dev",
        "wr_item_qty",
        "wr_dev",
        "average",
    ),
    "q91": ("Call_Center", "Call_Center_Name", "Manager", "Returns_Loss"),
    # --- round-9 batch 9: v2.7 structural variants + twins (_v27) ---
    "q6_v27": ('state', 'cnt'),
    "q11_v27": ('customer_id', 'customer_first_name', 'customer_last_name', 'customer_email_address'),
    "q12_v27": ('i_item_id', 'i_item_desc', 'i_category', 'i_class', 'i_current_price', 'itemrevenue', 'revenueratio'),
    "q14a_v27": ('channel', 'i_brand_id', 'i_class_id', 'i_category_id', 'sum_sales', 'number_sales'),
    "q20_v27": ('i_item_id', 'i_item_desc', 'i_category', 'i_class', 'i_current_price', 'itemrevenue', 'revenueratio'),
    "q22_v27": ('i_product_name', 'i_brand', 'i_class', 'i_category', 'qoh'),
    "q34_v27": ('c_last_name', 'c_first_name', 'c_salutation', 'c_preferred_cust_flag', 'ss_ticket_number', 'cnt'),
    "q35_v27": ('ca_state', 'cd_gender', 'cd_marital_status', 'cd_dep_count', 'cnt1', 'avg(cd_dep_count)', 'max(cd_dep_count)', 'sum(cd_dep_count)', 'cd_dep_employed_count', 'cnt2', 'avg(cd_dep_employed_count)', 'max(cd_dep_employed_count)', 'sum(cd_dep_employed_count)', 'cd_dep_college_count', 'cnt3', 'avg(cd_dep_college_count)', 'max(cd_dep_college_count)', 'sum(cd_dep_college_count)'),
    "q47_v27": ('i_category', 'd_year', 'd_moy', 'avg_monthly_sales', 'sum_sales', 'psum', 'nsum'),
    "q49_v27": ('channel', 'item', 'return_ratio', 'return_rank', 'currency_rank'),
    "q57_v27": ('i_category', 'i_brand', 'd_year', 'd_moy', 'avg_monthly_sales', 'sum_sales', 'psum', 'nsum'),
    "q72_v27": ('i_item_desc', 'w_warehouse_name', 'd_week_seq', 'no_promo', 'promo', 'total_cnt'),
    "q74_v27": ('customer_id', 'customer_first_name', 'customer_last_name'),
    "q78_v27": ('ratio', 'store_qty', 'store_wholesale_cost', 'store_sales_price', 'other_chan_qty', 'other_chan_wholesale_cost', 'other_chan_sales_price'),
    "q98_v27": ('i_item_id', 'i_item_desc', 'i_category', 'i_class', 'i_current_price', 'itemrevenue', 'revenueratio'),
    "q36a": ('gross_margin', 'i_category', 'i_class', 'lochierarchy', 'rank_within_parent'),
    "q51a": ('item_sk', 'd_date', 'web_sales', 'store_sales', 'web_cumulative', 'store_cumulative'),
    "q67a": ('i_category', 'i_class', 'i_brand', 'i_product_name', 'd_year', 'd_qoy', 'd_moy', 's_store_id', 'sumsales', 'rk'),
    "q70a": ('total_sum', 's_state', 's_county', 'lochierarchy', 'rank_within_parent'),
    "q77a": ('channel', 'id', 'sales', 'returns', 'profit'),
    "q80a": ('channel', 'id', 'sales', 'returns', 'profit'),
    "q86a": ('total_sum', 'i_category', 'i_class', 'lochierarchy', 'rank_within_parent'),
}

#: Queries whose verbatim text lives in the v2.7 resource dir.
V27_QUERIES = frozenset(
    {"q5a", "q10a", "q18a", "q35a",
     # round-9 batch 9: the structural v2.7 variants with distinct names
     # (q22a/q27a are excluded — double re-averaging, see module doc).
     "q36a", "q51a", "q67a", "q70a", "q77a", "q80a", "q86a"}
)
#: v2.7 twins of registered v1.4 queries: key -> .sql filename in the
#: v2.7 dir. The oracle rewrite branches dispatch on the BASE name, so a
#: twin inherits its v1.4 sibling's exact-arithmetic treatment (the
#: anchored assert counts police any shape drift between the versions).
V27_RENAMES = {
    f"{q}_v27": q
    for q in ("q6", "q11", "q12", "q14a", "q20", "q22", "q34", "q35",
              "q47", "q49", "q57", "q72", "q74", "q78", "q98",
              # v10: v2.7 q24 (the q24a/b CTE + own-address conjunction +
              # ORDER BY); its base name dispatches into the q24a/b
              # threshold rewrite.
              "q24")
}


def ref_sql_path(qname: str) -> str:
    """Absolute path of the reference .sql file a TPCDS_TEXTS key pins to."""
    base = "/root/reference/spark-code/code/sql/core/src/test/resources/tpcds"
    if qname in V27_RENAMES:
        return f"{base}-v2.7.0/{V27_RENAMES[qname]}.sql"
    if qname in V27_QUERIES:
        return f"{base}-v2.7.0/{qname}.sql"
    return f"{base}/{qname}.sql"

#: avg(...) rewrites per query (q7 store / q26 catalog): Spark computes
#: the exact decimal sum and divides once with HALF_UP at scale 6;
#: DuckDB's AVG over DECIMAL accumulates binary doubles (order-sensitive
#: at the ulp). The oracle rewrites decimal avgs to the same exact
#: integer form (micro-units = (cents*10^4*2 + n) // (2n), non-negative
#: inputs) and the int avg to exact-sum / count.
_AVG_REWRITES = {
    "q7": ("ss_quantity", ("ss_list_price", "ss_coupon_amt", "ss_sales_price")),
    "q26": ("cs_quantity", ("cs_list_price", "cs_coupon_amt", "cs_sales_price")),
    "q27": ("ss_quantity", ("ss_list_price", "ss_coupon_amt", "ss_sales_price")),
}


def _exact_ratio_2dp(a: str, b: str) -> str:
    """HALF_UP(a/b, 2dp) in HUGEINT over cents; NULL-propagating, exact."""
    ac = f"CAST({a} * 100 AS HUGEINT)"
    bc = f"CAST({b} * 100 AS HUGEINT)"
    return f"CAST(({ac} * 200 + {bc}) // (2 * {bc}) AS DECIMAL(38,0)) * 0.01"


def _exact_avg_dec2(col: str) -> str:
    """HALF_UP(avg(col), 6dp) for a non-negative DECIMAL(7,2) column, as
    exact HUGEINT micro-units re-expressed as DECIMAL — value-identical to
    Spark's avg(DECIMAL(7,2)) -> DECIMAL(11,6)."""
    cents = f"CAST(SUM({col}) * 100 AS HUGEINT)"
    n = f"COUNT({col})"
    return f"CAST(({cents} * 10000 * 2 + {n}) // (2 * {n}) AS DECIMAL(38,0)) * 0.000001"


def _exact_avg_dec2_signed(col: str) -> str:
    """Sign-safe variant for scale-2 decimal columns that can be NEGATIVE
    (q18a's agg5 averages cs_net_profit): HALF_UP in Java/Spark rounds
    ties AWAY FROM ZERO, so compute on |sum| and re-apply the sign —
    DuckDB's // floors, which would round negative ties the wrong way."""
    cents = f"CAST(SUM({col}) * 100 AS HUGEINT)"
    n = f"COUNT({col})"
    mag = f"((ABS({cents}) * 10000 * 2 + {n}) // (2 * {n}))"
    sign = f"(CASE WHEN {cents} < 0 THEN -1 ELSE 1 END)"
    return f"CAST({sign} * {mag} AS DECIMAL(38,0)) * 0.000001"


def _exact_div_dec2_by_int(numer: str, denom: str, scale: int) -> str:
    """HALF_UP(numer / denom, scale) for a non-negative scale-2 DECIMAL
    numerator and a positive INTEGER denominator, in exact HUGEINT
    arithmetic — mirrors Spark's decimal division, which computes the
    exact quotient and rounds HALF_UP at the result scale (q66's
    sales-per-sq-foot columns land at scale 12)."""
    cents = f"CAST({numer} * 100 AS HUGEINT)"
    num = f"({cents} * {10 ** (scale - 2)})"
    unit = "0." + "0" * (scale - 1) + "1"  # DECIMAL literal, not 1e-N (double)
    return (
        f"CAST(({num} * 2 + {denom}) // (2 * CAST({denom} AS HUGEINT)) "
        f"AS DECIMAL(38,0)) * {unit}"
    )


def _ratio_counts(num: str, den: str, scale: int, in_scale: int = 2) -> str:
    """HUGEINT count of HALF_UP(num/den, `scale` dp) for scale-`in_scale`
    DECIMAL operands — mirrors Spark's decimal division exactly: Spark
    computes the exact rational and rounds HALF_UP (away from zero, Java
    BigDecimal) at the type-derived result scale. NULL-propagates on NULL
    or zero denominators (Spark's non-ANSI decimal division yields NULL
    on /0). Two counts at the same scale compare exactly like the
    decimals they represent, so comparison sites can use the raw counts."""
    k = 10**in_scale
    n = f"CAST({num} * {k} AS HUGEINT)"
    d = f"CAST({den} * {k} AS HUGEINT)"
    mag = f"((ABS({n}) * {10 ** scale} * 2 + ABS({d})) // (2 * ABS(NULLIF({d}, 0))))"
    sign = f"(CASE WHEN ({n} < 0) != ({d} < 0) THEN -1 ELSE 1 END)"
    return f"({sign} * {mag})"


def _ratio_dec(num: str, den: str, scale: int, in_scale: int = 2) -> str:
    """The DECIMAL-output twin of _ratio_counts (value = count * 10^-scale)."""
    unit = "0." + "0" * (scale - 1) + "1"
    return f"CAST({_ratio_counts(num, den, scale, in_scale)} AS DECIMAL(38,0)) * {unit}"


def _windowed_exact_avg(expr: str, partition: str) -> str:
    """HALF_UP(avg(expr) OVER (partition), 6dp) for a non-negative
    scale-2 decimal aggregate expression, as exact HUGEINT micro-units —
    the window twin of _exact_avg_dec2 (q53/q63/q89's
    `avg(sum(ss_sales_price)) OVER (PARTITION BY ...)`)."""
    cents = f"SUM(CAST({expr} * 100 AS HUGEINT)) OVER ({partition})"
    n = f"COUNT(*) OVER ({partition})"
    return f"CAST(({cents} * 10000 * 2 + {n}) // (2 * {n}) AS DECIMAL(38,0)) * 0.000001"


#: q24 family parameters: the only text differences between the three
#: files are the i_color literal and v2.7's own-address conjunction
#: (reference texts: spark-code/code/sql/core/src/test/resources/
#: tpcds/q24a.sql, q24b.sql, tpcds-v2.7.0/q24.sql).
_Q24_PARAMS = {"q24a": ("pale", False), "q24b": ("chiffon", False), "q24_v27": ("pale", True)}


def _q24_oracle_py(qname: str):
    """Staged exact-integer Python oracle for the q24 family.

    The SQL oracle inlines the 10-column string-grain ssales CTE TWICE
    (DuckDB 1.0 has no CTE materialization) and additionally free-orders
    the customer x customer_address (birth_country = upper(country))
    join — at generated ~sf5 that plan exceeded 90 GB RSS and was the
    corpus's last RAM-infeasible oracle (COMPARE_sf5 r11 `_excluded`).
    This twin stages the join one bounded pair at a time in its own
    DuckDB connection (every intermediate is at returned-sale-row grain,
    prefiltered to s_market_id = 8 stores), aggregates netpaid in exact
    HUGEINT cents, then applies the threshold in exact Python integers:
    avg_micro = HALF_UP(sum_cents * 10^4 / n) mirrors Spark's
    avg(DECIMAL(17,2)) -> DECIMAL(21,6) (netpaid is non-negative), and
    `paid_cents * 10^6 > avg_micro * 5` is the 0.05 * avg comparison
    with both sides scaled to 10^-8 units — the same arithmetic the SQL
    oracle's `_exact_avg_dec2` rewrite performs. Proven identical to the
    SQL oracle at fixture scale by
    tests/test_tpcds.py::test_q24_py_oracle_matches_sql_oracle."""
    color, own_addr = _Q24_PARAMS[qname]

    def oracle(con, sf_dir: str):
        import decimal
        import os

        import duckdb

        tag = os.path.basename(os.path.normpath(sf_dir))
        star = f"{STAR_ROOT}/{tag}"
        c = duckdb.connect()
        try:
            rp = lambda t: f"read_parquet('{star}/{t}.parquet/*.parquet')"  # noqa: E731
            c.execute(
                f"""CREATE TEMP TABLE _store8 AS
                SELECT s_store_sk, s_store_name, s_state, s_zip
                FROM {rp('store')} WHERE s_market_id = 8"""
            )
            c.execute(
                f"""CREATE TEMP TABLE _ss8 AS
                SELECT ss.ss_item_sk, ss.ss_customer_sk, st.s_store_name,
                       st.s_state, st.s_zip,
                       CAST(ss.ss_net_paid * 100 AS HUGEINT) AS paid_cents
                FROM {rp('store_sales')} ss
                JOIN _store8 st ON ss.ss_store_sk = st.s_store_sk
                JOIN {rp('store_returns')} sr
                  ON ss.ss_ticket_number = sr.sr_ticket_number
                 AND ss.ss_item_sk = sr.sr_item_sk"""
            )
            c.execute(
                f"""CREATE TEMP TABLE _ssi AS
                SELECT s.*, i.i_color, i.i_current_price, i.i_manager_id,
                       i.i_units, i.i_size
                FROM _ss8 s JOIN {rp('item')} i ON s.ss_item_sk = i.i_item_sk"""
            )
            c.execute(
                f"""CREATE TEMP TABLE _ssc AS
                SELECT s.*, cu.c_last_name, cu.c_first_name,
                       cu.c_birth_country, cu.c_current_addr_sk
                FROM _ssi s JOIN {rp('customer')} cu
                  ON s.ss_customer_sk = cu.c_customer_sk"""
            )
            addr = "AND s.c_current_addr_sk = ca.ca_address_sk" if own_addr else ""
            rows = c.execute(
                f"""SELECT c_last_name, c_first_name, s_store_name, i_color,
                       SUM(paid_cents) AS netpaid_cents
                FROM _ssc s JOIN {rp('customer_address')} ca
                  ON s.c_birth_country = upper(ca.ca_country)
                 AND s.s_zip = ca.ca_zip {addr}
                GROUP BY c_last_name, c_first_name, s_store_name,
                         ca.ca_state, s_state, i_color, i_current_price,
                         i_manager_id, i_units, i_size"""
            ).fetchall()
        finally:
            c.close()

        names = ["c_last_name", "c_first_name", "s_store_name", "paid"]
        vals = [r[4] for r in rows if r[4] is not None]
        if not vals:
            # empty ssales: the scalar avg subquery is NULL, HAVING
            # NULL-compares false on both engines -> zero rows.
            return names, []
        n, total = len(vals), sum(int(v) for v in vals)
        avg_micro = (total * 10_000 * 2 + n) // (2 * n)
        groups: dict = {}
        for last, first, store, icolor, cents in rows:
            if icolor != color or cents is None:
                continue
            k = (last, first, store)
            groups[k] = groups.get(k, 0) + int(cents)
        out = [
            (last, first, store, decimal.Decimal(cents).scaleb(-2))
            for (last, first, store), cents in groups.items()
            if cents * 10**6 > avg_micro * 5
        ]
        return names, out

    oracle.__name__ = f"_q24_oracle_py_{qname}"
    return oracle


def _oracle_text(qname: str) -> str:
    """The query text as the DUCKDB oracle runs it (dialect-honest
    adaptations documented in the module docstring)."""
    text = TPCDS_TEXTS[qname]
    # v2.7 twins share their v1.4 sibling's rewrite branches (shape drift
    # is caught by the anchored assert counts; genuinely divergent twins
    # get their own qfull-keyed branches below).
    qfull = qname
    qname = qname[:-4] if qname.endswith("_v27") else qname
    # Backtick-quoted aliases (q16/q95's `order count `) are Spark/MySQL
    # dialect; DuckDB quotes identifiers with double quotes.
    if "`" in text:
        n_ticks = text.count("`")
        assert n_ticks % 2 == 0
        text = re.sub(r"`([^`]*)`", r'"\1"', text)
        assert "`" not in text
    if qname == "q2":
        # Anchor the rewrite count (ADVICE r8): a formatting drift in the
        # verbatim text would otherwise silently no-op the substitution and
        # the oracle would fall back to DuckDB's binary-double ROUND — the
        # documented ROUND-tie divergence class.
        text, n_sub = re.subn(
            r"round\((\w+) / (\w+), 2\)",
            lambda m: _exact_ratio_2dp(m.group(1), m.group(2)),
            text,
        )
        assert n_sub == 7, f"q2 round() rewrite anchored {n_sub} of 7 ratios"
    if qname in _AVG_REWRITES:
        int_col, dec_cols = _AVG_REWRITES[qname]
        text = text.replace(
            f"avg({int_col}) agg1",
            f"CAST(SUM({int_col}) AS DOUBLE) / COUNT({int_col}) agg1",
        )
        assert f"avg({int_col})" not in text, f"{qname} agg1 avg rewrite did not anchor"
        for i, col in enumerate(dec_cols, start=2):
            text = text.replace(f"avg({col}) agg{i}", f"{_exact_avg_dec2(col)} agg{i}")
            assert f"avg({col})" not in text, f"{qname} agg{i} avg rewrite did not anchor"
    if qname == "q21":
        # Spark SUM(int) is BIGINT; DuckDB's is HUGEINT (Arrow decimal128)
        # — cast the two conditional sums so the hashed schema matches.
        # The downstream inv_after/inv_before ratio stays exact: both
        # engines divide the exact integers in IEEE double.
        text, n_sub = re.subn(
            r"(sum\(CASE WHEN \(cast\(d_date AS DATE\) (?:<|>=) cast\('2000-03-11' AS DATE\)\)"
            r"\s*THEN inv_quantity_on_hand\s*ELSE 0 END\)) AS (inv_\w+)",
            r"CAST(\1 AS BIGINT) AS \2",
            text,
        )
        assert n_sub == 2, f"q21 sum cast anchored {n_sub} of 2"
    if qname == "q44":
        # avg(DECIMAL(7,2)) of a possibly-negative column, 6 occurrences
        # (select + HAVING + correlated scalar, twice each): DuckDB's AVG
        # over DECIMAL accumulates binary doubles; rewrite to the exact
        # sign-safe HALF_UP integer form so rank order, the 0.9x HAVING
        # threshold, and rank ties are all decided on exact decimals in
        # both engines.
        n_have = text.count("avg(ss_net_profit)")
        assert n_have == 6, f"q44 expected 6 avg sites, found {n_have}"
        text = text.replace("avg(ss_net_profit)", _exact_avg_dec2_signed("ss_net_profit"))
        assert "avg(ss_net_profit)" not in text
    if qname in ("q53", "q63", "q89", "q47", "q57"):
        # avg(sum(decimal)) OVER (PARTITION BY ...): Spark computes the
        # window average exactly in DECIMAL (HALF_UP at scale 6); DuckDB
        # in binary double — rewrite to exact windowed micro-units.
        col = "cs_sales_price" if qname == "q57" else "ss_sales_price"
        text, n_sub = re.subn(
            rf"avg\(sum\({col}\)\)\s*OVER\s*\(\s*(PARTITION BY [^)]*?)\s*\)",
            lambda m: _windowed_exact_avg(f"sum({col})", m.group(1)),
            text,
        )
        assert n_sub == 1, f"{qname} windowed avg anchored {n_sub} of 1"
    if qname == "q14a":
        # avg(int * DECIMAL(7,2)) over the 3-channel union — same
        # binary-double divergence class; non-negative, so the unsigned
        # exact form applies.
        # v1.4 writes `quantity * list_price`, v2.7 `quantity*list_price`.
        old = (
            "avg(quantity * list_price) average_sales"
            if qfull == "q14a"
            else "avg(quantity*list_price) average_sales"
        )
        assert text.count(old) == 1, f"{qfull} avg site"
        text = text.replace(
            old, f"{_exact_avg_dec2('(quantity * list_price)')} average_sales"
        )
        # ROLLUP/union NULL labels sort NULLS FIRST under Spark's ASC
        # default, NULLS LAST under DuckDB's, and LIMIT 100 binds — pin
        # Spark's semantics in the oracle (q18a precedent). The v1.4 and
        # v2.7 texts format the ORDER BY differently.
        if qfull == "q14a":
            old = "ORDER BY channel, i_brand_id, i_class_id, i_category_id\nLIMIT 100"
            new = (
                "ORDER BY channel NULLS FIRST, i_brand_id NULLS FIRST, "
                "i_class_id NULLS FIRST, i_category_id NULLS FIRST\nLIMIT 100"
            )
        else:
            old = "order by\n  channel,\n  i_brand_id,\n  i_class_id,\n  i_category_id\nlimit 100"
            new = (
                "order by\n  channel NULLS FIRST,\n  i_brand_id NULLS FIRST,"
                "\n  i_class_id NULLS FIRST,\n  i_category_id NULLS FIRST\nlimit 100"
            )
        assert text.count(old) == 1, f"{qfull} ORDER pin site"
        text = text.replace(old, new)
    if qname == "q22":
        old = "ORDER BY qoh, i_product_name, i_brand, i_class, i_category"
        assert text.count(old) == 1
        text = text.replace(
            old,
            "ORDER BY qoh, i_product_name NULLS FIRST, i_brand NULLS FIRST, "
            "i_class NULLS FIRST, i_category NULLS FIRST",
        )
    if qname == "q67":
        old = (
            "ORDER BY\n  i_category, i_class, i_brand, i_product_name, d_year,\n"
            "  d_qoy, d_moy, s_store_id, sumsales, rk"
        )
        assert text.count(old) == 1
        text = text.replace(
            old,
            "ORDER BY\n  i_category NULLS FIRST, i_class NULLS FIRST, "
            "i_brand NULLS FIRST, i_product_name NULLS FIRST, d_year NULLS FIRST,\n"
            "  d_qoy NULLS FIRST, d_moy NULLS FIRST, s_store_id NULLS FIRST, sumsales, rk",
        )
    if qname == "q13":
        # avg(int) -> exact sum/count double; avg(DECIMAL(7,2)) x2 ->
        # exact HALF_UP micro-units (both non-negative money columns).
        old = "avg(ss_quantity),"
        assert text.count(old) == 1
        text = text.replace(
            old, "CAST(SUM(ss_quantity) AS DOUBLE) / COUNT(ss_quantity),"
        )
        for col in ("ss_ext_sales_price", "ss_ext_wholesale_cost"):
            old = f"avg({col}),"
            assert text.count(old) == 1, f"q13 avg({col}) site"
            text = text.replace(old, f"{_exact_avg_dec2(col)},")
    if qname == "q28":
        # Six avg(ss_list_price) bucket columns, DuckDB binary-double AVG
        # vs Spark exact DECIMAL(11,6) — rewrite each, keeping its alias.
        text, n_sub = re.subn(
            r"avg\(ss_list_price\) (B\d_LP)",
            lambda m: f"{_exact_avg_dec2('ss_list_price')} {m.group(1)}",
            text,
        )
        assert n_sub == 6, f"q28 avg rewrite anchored {n_sub} of 6"
    if qname == "q29":
        # Three SUM(int) outputs: Spark BIGINT vs DuckDB HUGEINT.
        for col, alias in (
            ("ss_quantity", "store_sales_quantity"),
            ("sr_return_quantity", "store_returns_quantity"),
            ("cs_quantity", "catalog_sales_quantity"),
        ):
            old = f"sum({col}) AS {alias}"
            assert text.count(old) == 1, f"q29 {alias} site"
            text = text.replace(old, f"CAST(sum({col}) AS BIGINT) AS {alias}")
    if qname in ("q30", "q81", "q1"):
        # Correlated avg(SUM(DECIMAL(7,2)))*1.2 threshold: Spark computes
        # the avg exactly (HALF_UP at scale 6) then multiplies by the
        # exact decimal 1.2; DuckDB's AVG over DECIMAL is binary double —
        # knife-edge rows near the threshold would flip.
        old = "avg(ctr_total_return) * 1.2"
        assert text.count(old) == 1, f"{qname} threshold site"
        text = text.replace(old, f"{_exact_avg_dec2('ctr_total_return')} * 1.2")
    if qname in ("q32", "q92", "q6"):
        # Same exact-avg threshold class: 1.3 * avg(discount) correlated
        # per item (q32 catalog / q92 web), 1.2 * avg(price) per category
        # (q6).
        col = {
            "q32": "cs_ext_discount_amt",
            "q92": "ws_ext_discount_amt",
            "q6": "j.i_current_price",
        }[qname]
        old = f"avg({col})"
        assert text.count(old) == 1, f"{qname} avg site"
        text = text.replace(old, _exact_avg_dec2(col))
    if qname == "q9":
        # Ten avg(DECIMAL(7,2)) scalar subqueries (two per bucket).
        for col in ("ss_ext_discount_amt", "ss_net_paid"):
            n_have = text.count(f"avg({col})")
            assert n_have == 5, f"q9 avg({col}) sites: {n_have}"
            text = text.replace(f"avg({col})", _exact_avg_dec2(col))
    if qname == "q48":
        old = "SELECT sum(ss_quantity)"
        assert text.count(old) == 1
        text = text.replace(old, "SELECT CAST(sum(ss_quantity) AS BIGINT)")
    if qname == "q66":
        # Twelve sum(month_sales / w_warehouse_sq_ft) outputs: Spark
        # divides DECIMAL(28,2) by int exactly and rounds HALF_UP at the
        # derived scale 12, then sums the quotients exactly; DuckDB
        # divides in binary double. Reproduce the per-row quotient in
        # HUGEINT fixed-point and let DuckDB sum the exact decimals.
        text, n_sub = re.subn(
            r"sum\((\w+_sales) / w_warehouse_sq_ft\)",
            lambda m: f"SUM({_exact_div_dec2_by_int(m.group(1), 'w_warehouse_sq_ft', 12)})",
            text,
        )
        assert n_sub == 12, f"q66 per-sq-foot rewrite anchored {n_sub} of 12"
    if qname == "q97":
        # Three SUM(CASE..1..0) channel-overlap counters: BIGINT cast.
        text, n_sub = re.subn(
            r"(sum\(CASE WHEN .*?ELSE 0 END\)) (store_only|catalog_only|store_and_catalog)",
            r"CAST(\1 AS BIGINT) \2",
            text,
            flags=re.S,
        )
        assert n_sub == 3, f"q97 counter casts anchored {n_sub} of 3"
    if qname in ("q12", "q20", "q98"):
        # revenueratio = sum(price)*100 / windowed sum-of-sums: Spark
        # divides the exact decimals and rounds HALF_UP at the derived
        # scale 17; DuckDB's / over decimals is binary double.
        col = {"q12": "ws", "q20": "cs", "q98": "ss"}[qname]
        pat = (
            rf"sum\({col}_ext_sales_price\) \* 100 / sum\(sum\({col}_ext_sales_price\)\)"
            rf"\s*OVER\s*\(PARTITION BY i_class\) AS revenueratio"
        )
        num = f"(sum({col}_ext_sales_price) * 100)"
        den = f"sum(sum({col}_ext_sales_price)) OVER (PARTITION BY i_class)"
        text, n_sub = re.subn(pat, f"{_ratio_dec(num, den, 17)} AS revenueratio", text, flags=re.S)
        assert n_sub == 1, f"{qname} revenueratio rewrite anchored {n_sub} of 1"
    if qname == "q59":
        # Seven unrounded week-over-week ratios at Spark's derived
        # DECIMAL(37,20); NULL day-sums propagate through the count form.
        text, n_sub = re.subn(
            r"(\w{3})_sales1 / \1_sales2",
            lambda m: _ratio_dec(f"{m.group(1)}_sales1", f"{m.group(1)}_sales2", 20),
            text,
        )
        assert n_sub == 7, f"q59 ratio rewrite anchored {n_sub} of 7"
    if qname == "q61":
        # DECIMAL(15,4)/DECIMAL(15,4) -> scale-20 HALF_UP quotient, then
        # *100 (an exact left shift: final type DECIMAL(38,19), value =
        # count20 * 10^-18).
        old = "cast(promotions AS DECIMAL(15, 4)) / cast(total AS DECIMAL(15, 4)) * 100"
        assert text.count(old) == 1
        text = text.replace(
            old,
            f"CAST({_ratio_counts('promotions', 'total', 20)} AS DECIMAL(38,0))"
            " * 0.000000000000000001",
        )
    if qname == "q31":
        # Four quarter-over-quarter ratio OUTPUTS (decimal form) and the
        # same four quotients in the WHERE comparisons (raw counts —
        # both sides share scale 20, so count comparison == decimal
        # comparison; the CASE >0 guards plus NULLIF keep /0 NULL).
        for num_a, den_a, alias in (
            ("ws2.web_sales", "ws1.web_sales", "web_q1_q2_increase"),
            ("ss2.store_sales", "ss1.store_sales", "store_q1_q2_increase"),
            ("ws3.web_sales", "ws2.web_sales", "web_q2_q3_increase"),
            ("ss3.store_sales", "ss2.store_sales", "store_q2_q3_increase"),
        ):
            old = f"{num_a} / {den_a} {alias}"
            assert text.count(old) == 1, f"q31 select site {alias}"
            text = text.replace(old, f"{_ratio_dec(num_a, den_a, 20)} {alias}")
        text, n_sub = re.subn(
            r"(\w+\d)\.(web|store)_sales / (\w+\d)\.(web|store)_sales",
            lambda m: _ratio_counts(
                f"{m.group(1)}.{m.group(2)}_sales", f"{m.group(3)}.{m.group(4)}_sales", 20
            ),
            text,
        )
        assert n_sub == 4, f"q31 where-quotient rewrite anchored {n_sub} of 4"
    if qname in ("q11", "q74"):
        # Year-over-year growth comparison: both sides are Spark scale-20
        # HALF_UP quotients — compare the exact HUGEINT counts.
        text, n_sub = re.subn(
            r"t_(\w)_secyear\.year_total / t_(\w)_firstyear\.year_total",
            lambda m: _ratio_counts(
                f"t_{m.group(1)}_secyear.year_total",
                f"t_{m.group(2)}_firstyear.year_total",
                20,
            ),
            text,
        )
        assert n_sub == 2, f"{qname} quotient rewrite anchored {n_sub} of 2"
    if qname == "q4":
        # year_total sums a per-row DECIMAL division by 2 (Spark rounds
        # each quotient HALF_UP at derived scale 6 BEFORE the sum), and
        # the growth comparison divides DECIMAL(24,6) sums at derived
        # scale 14.
        pat = (
            r"\(\((\w\w)_ext_list_price - \1_ext_wholesale_cost - \1_ext_discount_amt\) \+"
            r"\s*\1_ext_sales_price\) /\s*2"
        )

        def _half(m):
            c = m.group(1)
            expr = (
                f"(({c}_ext_list_price - {c}_ext_wholesale_cost - "
                f"{c}_ext_discount_amt) + {c}_ext_sales_price)"
            )
            n = f"CAST({expr} * 1000000 AS HUGEINT)"
            return (
                f"CAST((CASE WHEN {n} < 0 THEN -1 ELSE 1 END) * ((ABS({n}) + 1) // 2) "
                f"AS DECIMAL(38,0)) * 0.000001"
            )

        text, n_sub = re.subn(pat, _half, text)
        assert n_sub == 3, f"q4 half-profit rewrite anchored {n_sub} of 3"
        text, n_sub = re.subn(
            r"t_(\w)_secyear\.year_total / t_(\w)_firstyear\.year_total",
            lambda m: _ratio_counts(
                f"t_{m.group(1)}_secyear.year_total",
                f"t_{m.group(2)}_firstyear.year_total",
                14,
                in_scale=6,
            ),
            text,
        )
        assert n_sub == 4, f"q4 quotient rewrite anchored {n_sub} of 4"
    if qname == "q18":
        # v1.4 twin of q18a: 7 avg(cast(col AS DECIMAL(12,2))) aggregates
        # (agg5 nets can be negative -> sign-safe form) + the rollup
        # NULLS FIRST pin (LIMIT 100 binds past sf0.01).
        text, n_sub = re.subn(
            r"avg\((cast\([\w\.]+ AS DECIMAL\(12, 2\)\))\) (agg\d)",
            lambda m: f"{_exact_avg_dec2_signed(m.group(1))} {m.group(2)}",
            text,
        )
        assert n_sub == 7, f"q18 avg rewrite anchored {n_sub} of 7"
        old = "ORDER BY ca_country, ca_state, ca_county, i_item_id"
        assert text.count(old) == 1
        text = text.replace(
            old,
            "ORDER BY ca_country NULLS FIRST, ca_state NULLS FIRST, "
            "ca_county NULLS FIRST, i_item_id NULLS FIRST",
        )
    if qname in ("q23a", "q23b"):
        # (50 / 100.0) * max: Spark evaluates the literal division and
        # the multiply exactly in DECIMAL; DuckDB's int/decimal division
        # is binary double — 0.5 is an exact DECIMAL(2,1) literal in both.
        old = "(50 / 100.0) *"
        assert text.count(old) == 1
        text = text.replace(old, "0.5 *")
    if qname == "q77":
        # DuckDB refuses `returns` as an IMPLICIT alias (soft keyword);
        # the explicit-AS form parses in both engines.
        old = "coalesce(returns, 0) returns,"
        assert text.count(old) == 1
        text = text.replace(old, "coalesce(returns, 0) AS returns,")
    if qname in ("q77", "q80"):
        # ROLLUP subtotal labels under LIMIT 100: pin Spark's ASC NULLS
        # FIRST (q5a/q14a precedent); the (channel, id) key chain is
        # unique per rollup row, so the bound subset is deterministic.
        old = "ORDER BY channel, id\nLIMIT 100"
        assert text.count(old) == 1
        text = text.replace(
            old, "ORDER BY channel NULLS FIRST, id NULLS FIRST\nLIMIT 100"
        )
    if qname in ("q24a", "q24b", "q24"):
        # Scalar-subquery threshold 0.05 * avg(SUM(decimal)) — exact
        # HALF_UP avg (netpaid = sum(ss_net_paid), non-negative). The
        # v2.7 q24 (key q24_v27) shares the site verbatim.
        old = "0.05 * avg(netpaid)"
        assert text.count(old) == 1, f"{qname} threshold site"
        text = text.replace(old, f"0.05 * {_exact_avg_dec2('netpaid')}")
    if qname == "q85":
        # Output/order columns are unaliased avgs: avg(int) -> exact
        # BIGINT sum over one IEEE division (both engines correctly
        # round); the two DECIMAL(7,2) avgs (refunded cash, fee — both
        # non-negative) -> exact HALF_UP micro-units, value-identical to
        # Spark's avg(DECIMAL(7,2)) -> DECIMAL(11,6). Rewrites hit the
        # SELECT list and the ORDER BY repeats (LIMIT 100 never binds:
        # <= 35 reason groups by dimension construction, so the ORDER is
        # cosmetic — rewritten anyway for subset determinism).
        text, n_sub = re.subn(
            r"avg\(ws_quantity\)",
            "CAST(SUM(ws_quantity) AS DOUBLE) / COUNT(ws_quantity)",
            text,
        )
        assert n_sub == 2, f"q85 int-avg rewrite anchored {n_sub} of 2"
        for col in ("wr_refunded_cash", "wr_fee"):
            text, n_sub = re.subn(
                rf"avg\({col}\)", _exact_avg_dec2(col).replace("\\", r"\\"), text
            )
            assert n_sub == 2, f"q85 {col} avg rewrite anchored {n_sub} of 2"
    if qname == "q27":
        # Rollup NULL labels under a binding LIMIT: pin Spark's ASC NULLS
        # FIRST (the avg rewrites ride _AVG_REWRITES).
        old = "ORDER BY i_item_id, s_state"
        assert text.count(old) == 1
        text = text.replace(old, "ORDER BY i_item_id NULLS FIRST, s_state NULLS FIRST")
    if qname == "q36":
        # gross_margin = SUM(decimal)/SUM(decimal) at Spark's derived
        # scale 20 (profit can be negative -> sign-safe count form), both
        # in the select and in the rank window's ORDER BY.
        text, n_sub = re.subn(
            r"sum\(ss_net_profit\) / sum\(ss_ext_sales_price\)",
            _ratio_dec("sum(ss_net_profit)", "sum(ss_ext_sales_price)", 20),
            text,
        )
        assert n_sub == 2, f"q36 gross_margin rewrite anchored {n_sub} of 2"
    if qname == "q49":
        # Six DECIMAL(15,4)/DECIMAL(15,4) ratios (return + currency per
        # channel) at derived scale 20; the rank windows order by the
        # aliases, so the exact values also fix the rank ties.
        text, n_sub = re.subn(
            r"\(cast\(sum\(coalesce\((\w+\.\w+), 0\)\) AS DECIMAL\(15, 4\)\) /"
            r"\s*cast\(sum\(coalesce\((\w+\.\w+), 0\)\) AS DECIMAL\(15, 4\)\)\)"
            r" AS (return_ratio|currency_ratio)",
            lambda m: (
                f"{_ratio_dec(f'cast(sum(coalesce({m.group(1)}, 0)) AS DECIMAL(15, 4))', f'cast(sum(coalesce({m.group(2)}, 0)) AS DECIMAL(15, 4))', 20, in_scale=4)}"
                f" AS {m.group(3)}"
            ),
            text,
        )
        n_total = n_sub
        # v2.7's web channel writes the same two ratios UPPERCASE and
        # without the outer parens.
        text, n_sub = re.subn(
            r"CAST\(SUM\(COALESCE\((\w+\.\w+), 0\)\) AS DECIMAL\(15, 4\)\) /"
            r"\s*CAST\(SUM\(COALESCE\((\w+\.\w+), 0\)\) AS DECIMAL\(15, 4\)\)"
            r" AS (return_ratio|currency_ratio)",
            lambda m: (
                f"{_ratio_dec(f'CAST(SUM(COALESCE({m.group(1)}, 0)) AS DECIMAL(15, 4))', f'CAST(SUM(COALESCE({m.group(2)}, 0)) AS DECIMAL(15, 4))', 20, in_scale=4)}"
                f" AS {m.group(3)}"
            ),
            text,
        )
        n_total += n_sub
        assert n_total == 6, f"{qfull} ratio rewrite anchored {n_total} of 6"
    if qname == "q54":
        # CAST((revenue / 50) AS INT): Spark divides the DECIMAL exactly,
        # rounds HALF_UP at derived scale 6, then truncates toward zero;
        # DuckDB's decimal/int is a double and its double->int CAST
        # ROUNDS. Reproduce: scale-6 count, then integer-divide by 10^6
        # (revenue >= 0, so truncation == floor).
        old = "cast((revenue / 50) AS INT)"
        assert text.count(old) == 1
        text = text.replace(
            old,
            f"CAST({_ratio_counts('revenue', '50', 6)} // 1000000 AS INT)",
        )
    if qname == "q58":
        # dev = rev/total/3*100: Spark rounds HALF_UP three times — at
        # scale 21 (decimal division), scale 21 again (/3), and scale 17
        # (*100 overflows precision). Mirror each step over HUGEINT
        # counts; revenues are non-negative.
        def _dev(m):
            rev = f"{m.group(1)}_item_rev"
            c1 = _ratio_counts(rev, "(ss_item_rev + cs_item_rev + ws_item_rev)", 21)
            c2 = f"(({c1}) * 2 + 3) // 6"
            c3 = f"(({c2}) * 200 + 10000) // 20000"
            return (
                f"CAST({c3} AS DECIMAL(38,0)) * 0.00000000000000001 {m.group(1)}_dev"
            )

        text, n_sub = re.subn(
            r"(\w{2})_item_rev / \(ss_item_rev \+ cs_item_rev \+ ws_item_rev\) / 3 \* 100 \1_dev",
            _dev,
            text,
        )
        assert n_sub == 3, f"q58 dev rewrite anchored {n_sub} of 3"
        old = "(ss_item_rev + cs_item_rev + ws_item_rev) / 3 average"
        assert text.count(old) == 1
        text = text.replace(
            old,
            f"CAST({_ratio_counts('(ss_item_rev + cs_item_rev + ws_item_rev)', '3', 6)}"
            " AS DECIMAL(38,0)) * 0.000001 average",
        )
        # Spark binds the unqualified ORDER BY item_id to the select-list
        # column; DuckDB calls it ambiguous (q72 precedent) — qualify.
        old = "ORDER BY item_id, ss_item_rev"
        assert text.count(old) == 1
        text = text.replace(old, "ORDER BY ss_items.item_id, ss_item_rev")
    if qname == "q65":
        old = "avg(revenue) AS ave"
        assert text.count(old) == 1
        text = text.replace(old, f"{_exact_avg_dec2('revenue')} AS ave")
    if qname == "q78":
        # SUM(int) -> BIGINT x3, and ratio = round(bigint/bigint, 2):
        # Spark divides in double and HALF_UP-rounds the shortest decimal
        # repr — equal to exact-rational HALF_UP for these magnitudes, so
        # compute it in integers and cast the exact 2dp decimal to DOUBLE.
        for col, alias in (
            ("ws_quantity", "ws_qty"),
            ("cs_quantity", "cs_qty"),
            ("ss_quantity", "ss_qty"),
        ):
            old = f"sum({col}) {alias}"
            assert text.count(old) == 1, f"q78 {alias} site"
            text = text.replace(old, f"CAST(sum({col}) AS BIGINT) {alias}")
        old = "round(ss_qty / (coalesce(ws_qty + cs_qty, 1)), 2)"
        n_have = text.count(old)
        assert n_have == 2, f"q78 ratio sites: {n_have}"
        den = "coalesce(ws_qty + cs_qty, 1)"
        exact = (
            f"CAST(CAST((CAST(ss_qty AS HUGEINT) * 200 + {den}) // "
            f"(2 * NULLIF(CAST({den} AS HUGEINT), 0)) AS DECIMAL(38,0)) * 0.01 AS DOUBLE)"
        )
        text = text.replace(old, exact)
    if qname == "q83":
        # Three SUM(int) quantity outputs -> BIGINT; the dev ratios stay
        # untouched (bigint/bigint is an IEEE double in BOTH engines);
        # average divides the bigint total by the DECIMAL 3.0, which
        # Spark computes exactly at derived scale 6.
        for col, alias in (
            ("sr_return_quantity", "sr_item_qty"),
            ("cr_return_quantity", "cr_item_qty"),
            ("wr_return_quantity", "wr_item_qty"),
        ):
            old = f"sum({col}) {alias}"
            assert text.count(old) == 1, f"q83 {alias} site"
            text = text.replace(old, f"CAST(sum({col}) AS BIGINT) {alias}")
        old = "(sr_item_qty + cr_item_qty + wr_item_qty) / 3.0 average"
        assert text.count(old) == 1
        text = text.replace(
            old,
            f"CAST({_ratio_counts('(sr_item_qty + cr_item_qty + wr_item_qty)', '3', 6, in_scale=0)}"
            " AS DECIMAL(38,0)) * 0.000001 average",
        )
    if qfull == "q35_v27":
        # v2.7 q35 swaps min() for sum() over the int dependent counts:
        # Spark BIGINT vs DuckDB HUGEINT.
        for col in ("cd_dep_count", "cd_dep_employed_count", "cd_dep_college_count"):
            old = f"sum({col})"
            assert text.count(old) == 1, f"q35_v27 sum({col}) site"
            text = text.replace(old, f"CAST(sum({col}) AS BIGINT)")
    if qname == "q36a":
        # Union-of-levels gross margin: the base level divides at derived
        # scale 20 and the UNION coerces it to the re-aggregated levels'
        # native DECIMAL(38,11) (one more HALF_UP); levels 1-2 divide at
        # scale 11 natively. Profits can be negative -> sign-safe.
        c20 = _ratio_counts("sum(ss_net_profit)", "sum(ss_ext_sales_price)", 20)
        c11 = (
            f"((CASE WHEN ({c20}) < 0 THEN -1 ELSE 1 END) * "
            f"((ABS({c20}) * 2 + 1000000000) // 2000000000))"
        )
        old = "sum(ss_net_profit)/sum(ss_ext_sales_price) as gross_margin"
        assert text.count(old) == 1, "q36a base-level site"
        text = text.replace(
            old, f"CAST({c11} AS DECIMAL(38,0)) * 0.00000000001 as gross_margin"
        )
        old = "sum(ss_net_profit) / sum(ss_ext_sales_price) as gross_margin"
        n_have = text.count(old)
        assert n_have == 2, f"q36a rollup-level sites: {n_have}"
        text = text.replace(
            old,
            f"{_ratio_dec('sum(ss_net_profit)', 'sum(ss_ext_sales_price)', 11)} as gross_margin",
        )
    if qname == "q67a":
        # Union NULL labels under a binding LIMIT: pin ASC NULLS FIRST.
        old = (
            "order by\n  i_category,\n  i_class,\n  i_brand,\n  i_product_name,"
            "\n  d_year,\n  d_qoy,\n  d_moy,\n  s_store_id,\n  sumsales,\n  rk"
        )
        assert text.count(old) == 1, "q67a ORDER site"
        text = text.replace(
            old,
            "order by\n  i_category NULLS FIRST,\n  i_class NULLS FIRST,"
            "\n  i_brand NULLS FIRST,\n  i_product_name NULLS FIRST,"
            "\n  d_year NULLS FIRST,\n  d_qoy NULLS FIRST,\n  d_moy NULLS FIRST,"
            "\n  s_store_id NULLS FIRST,\n  sumsales,\n  rk"
        )
    if qname == "q77a":
        # DuckDB refuses `returns` as an implicit alias (q77 precedent).
        old = "coalesce(returns, 0) returns"
        assert text.count(old) == 1, "q77a returns alias site"
        text = text.replace(old, "coalesce(returns, 0) AS returns")
    if qname in ("q77a", "q80a"):
        # Union subtotal NULL channel/id labels under LIMIT 100.
        old = "order by\n  channel, id\nlimit 100"
        assert text.count(old) == 1, f"{qname} ORDER site"
        text = text.replace(
            old, "order by\n  channel NULLS FIRST, id NULLS FIRST\nlimit 100"
        )
    if qname in ("q62", "q99", "q50"):
        # Five SUM(CASE ... THEN 1 ELSE 0) day-bucket counters per query:
        # Spark BIGINT vs DuckDB HUGEINT — cast each (backticks already
        # converted to double quotes above).
        text, n_sub = re.subn(
            r'(sum\(CASE WHEN \(.*?ELSE 0 END\))(\s+AS "[^"]*")',
            r"CAST(\1 AS BIGINT)\2",
            text,
            flags=re.S,
        )
        assert n_sub == 5, f"{qname} day-bucket casts anchored {n_sub} of 5"
    if qname == "q90":
        # DECIMAL(15,4)/DECIMAL(15,4): Spark divides exactly in DECIMAL
        # (result scale 20, HALF_UP); DuckDB in binary DOUBLE — rewrite
        # to the exact HUGEINT form at the same 20-digit scale.
        old = "cast(amc AS DECIMAL(15, 4)) / cast(pmc AS DECIMAL(15, 4)) am_pm_ratio"
        assert text.count(old) == 1
        text = text.replace(
            old,
            "CAST((CAST(amc AS HUGEINT) * 100000000000000000000 * 2 + pmc)"
            " // (2 * pmc) AS DECIMAL(38,0)) * 0.00000000000000000001 AS am_pm_ratio",
        )
    if qname == "q72":
        # Spark resolves the unqualified ORDER BY d_week_seq to the
        # select-list column (d1.d_week_seq); DuckDB refuses the ambiguous
        # name outright (d1 vs d2 vs d3) — qualify it to what Spark binds.
        old = "ORDER BY total_cnt DESC, i_item_desc, w_warehouse_name, d_week_seq"
        assert text.count(old) == 1
        text = text.replace(
            old, "ORDER BY total_cnt DESC, i_item_desc, w_warehouse_name, d1.d_week_seq"
        )
    if qname == "q18a":
        # 7 avg(DECIMAL(12,2)) aggregates repeated across the 4 grouping
        # levels; agg5 (net profit) can be negative -> sign-safe form.
        for i in range(1, 8):
            text = text.replace(f"avg(agg{i}) agg{i}", f"{_exact_avg_dec2_signed(f'agg{i}')} agg{i}")
        assert "avg(agg" not in text, "q18a avg(agg_i) rewrites did not anchor"
        # Spark's ASC default is NULLS FIRST, DuckDB's is NULLS LAST, and
        # q18a's LIMIT 100 binds at sf0.1 over rollup-style NULL rows —
        # make Spark's semantics explicit in the oracle.
        text = text.replace(
            "order by\n  ca_country,\n  ca_state,\n  ca_county,\n  i_item_id",
            "order by\n  ca_country NULLS FIRST,\n  ca_state NULLS FIRST,\n"
            "  ca_county NULLS FIRST,\n  i_item_id NULLS FIRST",
        )
        assert "NULLS FIRST" in text, "q18a ORDER BY rewrite did not anchor"
    return text


def _referenced_tables(text: str) -> list[str]:
    return [t for t in TPCDS_TABLES if re.search(rf"\b{t}\b", text)]


def _spliced_body(qname: str) -> str:
    """The (adapted) verbatim body with star tables spliced in as
    read_parquet CTEs over the committed sf0.01 slice — the self-contained
    inner statement both tpcds_oracle and the LIMIT-boundary probe build
    on."""
    text = _oracle_text(qname)
    prelude = ",\n".join(
        f"{t} AS (SELECT * FROM read_parquet('{STAR_ROOT}/{ORACLE_TAG}/{t}.parquet/*.parquet'))"
        for t in _referenced_tables(text)
    )
    body = text.lstrip()
    # v2.7 texts open with a `-- new in v2.7` comment line; drop leading
    # comment lines so the WITH-splice sees the statement head (the Spark
    # side keeps the comment — the text there stays verbatim).
    while body.startswith("--"):
        body = body.split("\n", 1)[1].lstrip()
    if body[:4].upper() == "WITH":
        return "WITH " + prelude + ",\n" + body[4:].lstrip()
    return "WITH " + prelude + "\n" + body


def tpcds_oracle(qname: str) -> str:
    """Self-contained DuckDB oracle: star tables as read_parquet CTEs over
    the committed sf0.01 slice, the (adapted) verbatim body spliced in,
    and Spark's output column names applied positionally."""
    spliced = _spliced_body(qname)
    cols = ", ".join('"' + c.replace('"', '""') + '"' for c in SPARK_COLS[qname])
    return f"SELECT * FROM (\n{spliced}\n) AS tpcds_result({cols})"


# ---------------------------------------------------------------------------
# Mechanized LIMIT-boundary audit (VERDICT r10 item 2): for every verbatim
# query whose text ends in `LIMIT n`, run the FULL (un-LIMITed) statement
# in its own sort order and examine the cut. The LIMIT subset is
# engine-invariant iff either (a) the full result has <= n rows (the LIMIT
# never binds), (b) the ORDER BY key tuple is strictly unequal between
# positions n-1 and n, or (c) the tie group spanning the cut consists of
# pairwise-IDENTICAL full rows (q59's class: any engine's pick is the same
# multiset). This is CLAUDE.md's "probe rows[99]==rows[100]" registration
# rule made permanent — tests/test_tpcds.py::test_limit_boundary_is_tie_free
# runs it at sf0.01, sf0.1 and the generated ~sf1 star when present.
# ---------------------------------------------------------------------------
_ORDER_KEY_MODS = re.compile(
    r"^(?P<expr>.*?)(?:\s+(?P<dir>asc|desc))?(?:\s+nulls\s+(?P<nulls>first|last))?\s*$",
    re.I | re.S,
)


def _split_depth0(s: str, sep: str = ",") -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _depth0_finditer(pattern: str, s: str):
    for m in re.finditer(pattern, s, re.I):
        if s.count("(", 0, m.start()) == s.count(")", 0, m.start()):
            yield m


def limit_boundary_probe(qname: str) -> tuple[int, str, list[str]] | None:
    """Return (limit_n, full_sql, order_keys) for a trailing-LIMIT verbatim
    query, or None when the text carries no final LIMIT (order-insensitive
    differential). full_sql is the oracle-adapted spliced body with ONLY
    the trailing LIMIT stripped — it returns every row in the statement's
    own sort order (DuckDB dialect; re-point to another SF's star with
    plans.differential.adapt_oracle). order_keys are the raw statement-level
    ORDER BY items with asc/desc/nulls modifiers stripped (equality at the
    cut doesn't depend on direction); empty when the statement has a LIMIT
    but no ORDER BY (the single-row scalar-report class — the audit then
    just requires the full result to stay <= n rows)."""
    inner = _spliced_body(qname)
    m = re.search(r"\blimit\s+(\d+)\s*;?\s*$", inner, re.I)
    if not m:
        return None
    n = int(m.group(1))
    head = inner[: m.start()]
    last = None
    for om in _depth0_finditer(r"\border\s+by\b", head):
        last = om
    keys: list[str] = []
    if last is not None:
        # q11_v27/q78_v27 carry `-- v1.4 order-by was ...` comment lines
        # inside the clause — drop them before splitting.
        clause = re.sub(r"--[^\n]*", "", head[last.end() :])
        for item in _split_depth0(clause):
            km = _ORDER_KEY_MODS.match(item)
            keys.append(km.group("expr").strip())
    return n, head, keys


def resolve_order_key_indices(
    qname: str, keys: list[str], colnames: list[str]
) -> list[int]:
    """Map statement-level ORDER BY items onto OUTPUT column positions so
    the audit can compare key tuples at the LIMIT cut:

    - positional (`3`) -> index 2;
    - bare / `alias.col`-qualified names -> the output column of that name
      (qualifiers bind to the underlying scope, but every such TPC-DS key
      surfaces in the select list under its unqualified name);
    - expressions (`count(distinct cs_order_number)`) -> the select-list
      item with the identical normalized expression text, taking its
      position.
    Raises KeyError when a key cannot be anchored to an output column —
    the audit treats that query as requiring a documented manual entry
    rather than guessing."""
    inner = _spliced_body(qname)
    m = re.search(r"\blimit\s+(\d+)\s*;?\s*$", inner, re.I)
    head = inner[: m.start()] if m else inner
    last_ob = None
    for om in _depth0_finditer(r"\border\s+by\b", head):
        last_ob = om
    stmt = head[: last_ob.start()] if last_ob is not None else head

    def norm(s: str) -> str:
        return re.sub(r"\s+", " ", s.strip().lower())

    # final select list: between the last depth-0 SELECT and its depth-0 FROM
    sel_starts = list(_depth0_finditer(r"\bselect\b", stmt))
    expr_to_pos: dict[str, int] = {}
    if sel_starts:
        tail = stmt[sel_starts[-1].end() :]
        from_m = next(_depth0_finditer(r"\bfrom\b", tail), None)
        sel_list = tail[: from_m.start()] if from_m else tail
        for pos, item in enumerate(_split_depth0(sel_list)):
            am = re.match(r"^(?P<expr>.*?)(?:\s+as)?\s+(?P<alias>\"[^\"]+\"|\w+)\s*$", item, re.I | re.S)
            expr_to_pos[norm(item)] = pos
            if am:
                expr_to_pos.setdefault(norm(am.group("expr")), pos)

    lower_cols = [c.lower() for c in colnames]
    out: list[int] = []
    for k in keys:
        if k.isdigit():
            out.append(int(k) - 1)
            continue
        bare = k.split(".", 1)[1] if re.match(r"^\w+\.\w+$", k) else k
        bare_l = bare.strip('"').lower()
        if bare_l in lower_cols:
            out.append(lower_cols.index(bare_l))
            continue
        nk = norm(k)
        if nk in expr_to_pos:
            out.append(expr_to_pos[nk])
            continue
        # q35's class: the key is a GROUP BY column surfacing only through
        # min()/max() aggregates — within a group min(col) == col, so the
        # aggregate column is an exact stand-in (ordering by a non-output
        # column is only legal when it IS a group key).
        for agg in (f"min({bare_l})", f"max({bare_l})"):
            if agg in lower_cols:
                out.append(lower_cols.index(agg))
                break
        else:
            raise KeyError(
                f"{qname}: ORDER BY key {k!r} not anchorable to output columns {colnames}"
            )
    return out


#: ORDER BY items that are EXPRESSIONS over output columns (no output
#: column carries the computed value): evaluated Python-side by the audit.
#: Keyed by whitespace-collapsed lowercase expression text; values are
#: (builder, *operand column names). Floats: tie DETECTION tolerates the
#: decimal->double conversion — both engines sort by the same computed
#: double, and a spurious Python-level tie only makes the audit stricter.
_EXPR_BOUNDARY_KEYS = {
    # q36 / q36a / q86 / q86a
    "case when lochierarchy = 0 then i_category end": (
        lambda ix_case, ix_then: (
            lambda row: row[ix_then] if row[ix_case] == 0 else None
        ),
        "lochierarchy",
        "i_category",
    ),
    # q47 / q47_v27 / q57-family shape
    "sum_sales - avg_monthly_sales": (
        lambda ix_a, ix_b: (
            lambda row: (
                None
                if row[ix_a] is None or row[ix_b] is None
                else float(row[ix_a]) - float(row[ix_b])
            )
        ),
        "sum_sales",
        "avg_monthly_sales",
    ),
}


def boundary_key_funcs(qname: str, keys: list[str], colnames: list[str]):
    """Per-ORDER-BY-item extractors for the LIMIT-boundary audit: each is
    row -> key value. Plain/positional/aggregate-anchored keys resolve to
    an output index (resolve_order_key_indices); expression keys evaluate
    via _EXPR_BOUNDARY_KEYS. Keys anchorable to NO output column (hidden
    group keys like q12/q20's i_item_id, q78_v27's ss_item_sk scope
    columns) are DROPPED — strictly conservative for the audit: a dropped
    key can only turn a full-chain inequality into an apparent tie (a
    false alarm the test surfaces), never mask a real boundary ambiguity.
    Raises KeyError only when not a single key anchors."""
    lower_cols = [c.lower() for c in colnames]
    funcs = []
    for k in keys:
        nk = re.sub(r"\s+", " ", k.strip().lower())
        if nk in _EXPR_BOUNDARY_KEYS:
            builder, *operands = _EXPR_BOUNDARY_KEYS[nk]
            funcs.append(builder(*(lower_cols.index(o) for o in operands)))
            continue
        try:
            idx = resolve_order_key_indices(qname, [k], colnames)[0]
        except KeyError:
            continue  # hidden key: drop (conservative)
        funcs.append(lambda row, i=idx: row[i])
    if not funcs:
        raise KeyError(f"{qname}: no ORDER BY key anchorable to output columns {colnames}")
    return funcs


def _make_builder(qname: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_star_views(spark, sf_dir)
        return spark.sql(TPCDS_TEXTS[qname])

    run.__name__ = f"sql_text_tpcds_{qname}"
    run.__doc__ = (
        f"TPC-DS {qname} VERBATIM (tpcds_texts.py) over the generated star "
        "slice — the reference's spark.sql(queryString) execution path "
        "(TPCDSQueryBenchmark.scala:100)."
    )
    return run


#: Queries whose output carries DECIMAL money columns on BOTH engines
#: (everything except the pure count/demographic reports) — the
#: 'decimal-native' tag tells the oracle-schema guard the decimals are
#: the contract, not an uncast integer SUM.
_COUNT_ONLY = frozenset(
    {"q10", "q10a", "q34", "q73", "q88", "q96",
     # round 9: q38/q87 count rows, q44 ranks+names, q72 counts,
     # q21 BIGINT-cast conditional sums, q22 a double avg.
     "q38", "q87", "q44", "q72", "q21", "q22",
     # batch 4: q62/q99 BIGINT day buckets, q84 strings only.
     "q62", "q99", "q84",
     # batch 5: q6/q35/q97 counts, q29/q48 BIGINT quantity sums, q50
     # BIGINT day buckets, q32 a literal INT 1 per matching row.
     "q6", "q29", "q32", "q35", "q48", "q50", "q97",
     # batch 6: q4/q11/q74 output customer strings only.
     "q4", "q11", "q74",
     # batch 8: q1/q41 strings, q54 int segments, q69 counts.
     "q1", "q41", "q54", "q69",
     # batch 9 twins/variants without decimal outputs.
     "q6_v27", "q11_v27", "q22_v27", "q34_v27", "q35_v27", "q72_v27", "q74_v27"}
)

for _qname in sorted(SPARK_COLS):
    _tags = ("sql-text", "tpcds", "star", "verbatim")
    if _qname not in _COUNT_ONLY:
        _tags += ("decimal-native",)
    query(
        f"sql_text_tpcds_{_qname}",
        oracle=tpcds_oracle(_qname),
        tags=_tags,
        doc=f"Verbatim TPC-DS {_qname} through spark.sql over the star slice.",
        # q24 family: the SQL oracle's twice-inlined ssales CTE is
        # RAM-infeasible in DuckDB past ~sf1; the staged exact-integer
        # twin adjudicates generated-scale runs (--py-oracle).
        oracle_py=_q24_oracle_py(_qname) if _qname in _Q24_PARAMS else None,
    )(_make_builder(_qname))
