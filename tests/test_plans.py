"""Physical-plan hygiene: the properties that make these queries survive a
100× scale-up (pushdown, pruning, broadcast, partial agg, no Python in the
hot path). A correctness-green query with a bad plan FAILS here."""

from __future__ import annotations

import pytest

from spark_cherry_shuffle_service_spark.plans.explain import (
    count_ops,
    formatted_plan,
    plan_ops,
    pushed_filters,
    read_schemas,
    uses_python_eval,
)
from spark_cherry_shuffle_service_spark.plans.registry import all_specs
from tests.conftest import SF_SMOKE

SPECS = all_specs()


def test_filter_pushes_to_parquet_scan(spark):
    df = SPECS["pricing_summary"].builder(spark, SF_SMOKE)
    pf = " ".join(pushed_filters(df))
    assert "l_shipdate" in pf, f"date filter not pushed: {pf}"


def test_column_pruning_reads_only_needed_columns(spark):
    df = SPECS["pricing_summary"].builder(spark, SF_SMOKE)
    schemas = read_schemas(df)
    assert schemas, "no ReadSchema found"
    # lineitem has 11 columns; the query touches 7
    assert all("l_orderkey" not in s and "l_partkey" not in s for s in schemas), schemas


def test_dim_joins_broadcast_not_shuffle(spark):
    df = SPECS["join_inner"].builder(spark, SF_SMOKE)
    ops = plan_ops(df)
    assert ops.count("BroadcastHashJoin") == 2, ops
    assert "SortMergeJoin" not in ops


def test_top_revenue_broadcasts_customer(spark):
    df = SPECS["top_revenue"].builder(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    # top-k goes through TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_aggregations_are_partial(spark):
    """Map-side combine: HashAggregate below AND above the exchange —
    the skew-absorbing property the reference chases with its shuffle
    service (SURVEY.md §2.12)."""
    df = SPECS["skewed_groupcount"].builder(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2, plan
    assert count_ops(df, "Exchange") == 1, plan


def test_single_pass_conditional_agg(spark):
    df = SPECS["conditional_agg"].builder(spark, SF_SMOKE)
    assert count_ops(df, "Exchange") == 1  # one shuffle for 4 conditional sums


# Sanctioned Python paths (SURVEY.md §2.11): Arrow-batched mapInPandas /
# mapInArrow operators, plus the UDTF surface (Python-per-row is the point
# of a table function — its set-oriented JVM twin is text_hof/text_chunk).
# Everything else must stay JVM-side.
_ARROW_OK = sorted(n for n, s in SPECS.items() if {"mapInPandas", "mapInArrow"} & set(s.tags))
_PY_SANCTIONED = sorted(n for n, s in SPECS.items() if "python-sanctioned" in s.tags or n in _ARROW_OK)


@pytest.mark.parametrize("name", sorted(n for n in SPECS if n not in _PY_SANCTIONED))
def test_no_python_in_hot_path(spark, name):
    df = SPECS[name].builder(spark, SF_SMOKE)
    assert not uses_python_eval(df), f"{name} row-trips through Python"


@pytest.mark.parametrize("name", _ARROW_OK)
def test_multimodal_python_is_arrow_batched(spark, name):
    plan = formatted_plan(SPECS[name].builder(spark, SF_SMOKE))
    arrow_ops = (
        "MapInPandas",
        "AggregateInPandas",
        "FlatMapGroupsInPandas",
        "ArrowAggregatePython",
        "MapInArrow",
    )
    assert any(op in plan for op in arrow_ops), plan[:1500]


def test_udtf_runs_as_python_table_function(spark):
    plan = formatted_plan(SPECS["udtf_bigrams"].builder(spark, SF_SMOKE))
    assert "PythonUDTF" in plan, plan[:1500]


def test_ivf_assignment_broadcasts_centroids(spark):
    """IVF scale path: centroid assignment must be a broadcast join (the
    centroid table is tiny); no shuffle of the full embedding table just to
    pick cells."""
    df = SPECS["similarity_ivf"].builder(spark, SF_SMOKE)
    assert "BroadcastNestedLoopJoin" in plan_ops(df) or "BroadcastHashJoin" in plan_ops(df)


def test_cube_and_grouping_sets_expand_before_shuffle(spark):
    """CUBE/GROUPING SETS run as a single Expand pass — not one job per
    grouping set — and the Expand's input is the finest-grain PRE-AGGREGATE
    (partial-agg-under-Expand): fan-out is |groups|x(sets), not
    |lineitem|x(sets). Two exchanges total: pre-agg shuffle + cube shuffle;
    at 100 TB the first reduces the fact table to group cardinality before
    any row multiplication happens."""
    for name in ("agg_cube", "agg_grouping_sets"):
        df = SPECS[name].builder(spark, SF_SMOKE)
        plan = formatted_plan(df)
        assert "Expand" in plan, name
        assert count_ops(df, "Exchange") == 2, name
        # Expand must consume the aggregated frame, not the scan: in the
        # formatted tree (leaves last), the first HashAggregate pair's
        # output feeds Expand, so Expand appears ABOVE at least two
        # HashAggregates (the pre-agg partial+final).
        assert plan.count("HashAggregate") >= 4, name


def test_salted_groupcount_is_two_phase(spark):
    """Salting: two aggregation exchanges (key+salt, then key), each with
    map-side partials — the hot key never lands on a single reducer whole."""
    df = SPECS["skewed_salted_groupcount"].builder(spark, SF_SMOKE)
    assert count_ops(df, "Exchange") == 2
    assert formatted_plan(df).count("HashAggregate") >= 4


def test_join_strategy_hints_control_physical_plan(spark):
    """The full join-strategy surface the reference relies on Catalyst for
    (SparkStrategies.scala:139 JoinSelection, SURVEY.md §2.3) is steerable
    per-join via hints: BROADCAST, MERGE, SHUFFLE_HASH."""
    from pyspark.sql import functions as F

    from spark_cherry_shuffle_service_spark.sources.catalog import table

    li = table(spark, SF_SMOKE, "lineitem")
    orders = table(spark, SF_SMOKE, "orders")
    cases = {
        "broadcast": "BroadcastHashJoin",
        "merge": "SortMergeJoin",
        "shuffle_hash": "ShuffledHashJoin",
    }
    for hint, op in cases.items():
        j = li.join(orders.hint(hint), li.l_orderkey == orders.o_orderkey)
        assert op in plan_ops(j), f"{hint} → {plan_ops(j)}"


def test_aqe_and_skew_handling_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"


def test_aqe_actually_splits_skewed_join(spark):
    """Not just config: with thresholds scaled to fixture size, AQE must
    mark the hot-key join as skew-handled in the final adaptive plan — the
    runtime effect Cherry targets with its task-aware service
    (SURVEY.md §2.12 'Skew-aware interest')."""
    from pyspark.sql import functions as F

    from spark_cherry_shuffle_service_spark.operators.workloads import skewed_pairs

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        # Skewed fact side (90% of rows on key 1, ~100 B/row → hot partition
        # ≫ 64 KB) joined to a unique-key dim side: output stays |fact|,
        # only the hot partition needs splitting.
        fact = skewed_pairs(spark, 200_000, 8, 0.9)
        dim = spark.range(0, 8).select(F.col("id").alias("key"), (F.col("id") * 10).alias("attr"))
        joined = fact.join(dim, "key")
        # collect THIS DataFrame: AQE finalizes a plan only after its own
        # execution (count() would run a different, agg-topped plan).
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_forecast_revenue_is_pure_pushdown_scan(spark):
    """Q6 analog: every predicate reaches the parquet scan; exactly one
    aggregation exchange and no join — the plan a 100 TB scan needs."""
    df = SPECS["forecast_revenue"].builder(spark, SF_SMOKE)
    pf = " ".join(pushed_filters(df))
    for col in ("l_discount", "l_quantity"):
        assert col in pf, f"{col} not pushed: {pf}"
    ops = plan_ops(df)
    assert not any("Join" in o for o in ops), ops
    assert count_ops(df, "Exchange") == 1, ops


def test_discounted_revenue_extracts_equi_key_from_disjunction(spark):
    """Q19 analog: the OR-of-ANDs predicate spans both sides, but Catalyst
    must still join on the common p_partkey equi-key (hash join), never a
    nested-loop over the disjunction."""
    df = SPECS["discounted_revenue"].builder(spark, SF_SMOKE)
    ops = plan_ops(df)
    assert "BroadcastHashJoin" in ops, ops
    assert "BroadcastNestedLoopJoin" not in ops and "CartesianProduct" not in ops, ops


def test_waiting_suppliers_reuses_orderkey_partitioning(spark):
    """Q21 analog: the min/max-stats rewrite of EXISTS / NOT EXISTS must
    stay at ≤4 exchanges — the late-line groupBy and both stats joins
    reuse the l_orderkey partitioning from the orders join (2.5× over the
    semi+anti pair-set form, BASELINE.md)."""
    df = SPECS["waiting_suppliers"].builder(spark, SF_SMOKE)
    assert count_ops(df, "Exchange") <= 4, plan_ops(df)


def test_customer_distribution_keeps_predicate_inside_outer_join(spark):
    """Q13 analog: the o_orderpriority filter lives in the join condition —
    unmatched customers must survive, so the plan keeps LeftOuter with the
    extra predicate rather than filtering before/after."""
    df = SPECS["customer_distribution"].builder(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "LeftOuter" in plan, plan[:1200]
    # two aggregations: per-customer count, then histogram
    assert plan.count("HashAggregate") >= 4, plan[:1200]


def test_min_cost_supplier_broadcasts_bounded_sides(spark):
    """Q2 analog: region-filtered supplier set and size/type-filtered part
    slice are bounded independent of SF — both must broadcast; the only
    shuffles are the pair-distinct and the per-part MIN."""
    df = SPECS["min_cost_supplier"].builder(spark, SF_SMOKE)
    ops = plan_ops(df)
    assert ops.count("BroadcastHashJoin") >= 3, ops
    assert "CartesianProduct" not in ops, ops


def test_salted_join_shuffles_on_key_plus_salt(spark):
    """Join-side salting: the physical join must be a shuffled join whose
    keys include the salt column — the hot key's rows spread across `salt`
    reducers instead of landing on one."""
    df = SPECS["skewed_salted_join"].builder(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "ShuffledHashJoin" in plan_ops(df), plan_ops(df)
    assert "fsalt" in plan and "dsalt" in plan, plan[:1500]


def test_runtime_bloom_filter_prunes_shuffle_join_probe(spark):
    """Runtime filter injection (the non-partitioned cousin of dynamic
    partition pruning): a selective dim filter on a shuffle join injects a
    bloom filter of the build keys into the fact scan, pruning probe rows
    before the exchange — at 100 TB this cuts the shuffled bytes of every
    selective fact⋈dim join. Thresholds lowered to fixture scale; config
    restored after."""
    from pyspark.sql import functions as F

    from spark_cherry_shuffle_service_spark.sources.catalog import table

    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    prev_scan = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = table(spark, SF_SMOKE, "lineitem")
        prt = table(spark, SF_SMOKE, "part").filter(F.col("p_type") == "PROMO")
        j = li.join(prt, li.l_partkey == prt.p_partkey).groupBy("p_brand").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:1500]
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", prev_scan
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)


def test_agg_moments_single_pass(spark):
    """All four power sums + count compute in ONE aggregation (one
    exchange) — no second scan per moment."""
    df = SPECS["agg_moments"].builder(spark, SF_SMOKE)
    assert count_ops(df, "Exchange") == 1, plan_ops(df)


def test_daily_gapfill_broadcasts_spine(spark):
    """The generated date spine is bounded by the date range, never SF —
    it must broadcast against the daily aggregate, not shuffle it."""
    df = SPECS["daily_gapfill"].builder(spark, SF_SMOKE)
    assert "BroadcastHashJoin" in plan_ops(df), plan_ops(df)


@pytest.mark.parametrize(
    "name",
    [
        "similarity_pairs",
        "dedup_embedding_cosine",
        "dedup_ngram_jaccard",
        "dedup_crossmodal",
        "similarity_knn_graph",
        "orders_market_basket",
        "dedup_incremental",
    ],
)
def test_pair_generators_have_no_allpairs_product(spark, name):
    """Round-1 shipped these as O(N²) theta joins; candidates must now come
    from bounded-key hash joins (LSH buckets / prefix tokens) — no
    CartesianProduct or BroadcastNestedLoopJoin anywhere in the plan."""
    ops = plan_ops(SPECS[name].builder(spark, SF_SMOKE))
    assert "CartesianProduct" not in ops, ops
    assert "BroadcastNestedLoopJoin" not in ops, ops


def test_range_join_is_bucketed_equi_join(spark):
    """events_range_join must plan as an equi-join on (user, bin) — the
    bucketed interval join — not a BroadcastNestedLoopJoin over the raw
    range predicate."""
    ops = plan_ops(SPECS["events_range_join"].builder(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in ops, ops
    assert "CartesianProduct" not in ops, ops


def test_decontaminate_broadcasts_eval_grams(spark):
    """The eval-set gram table is fixed-size (SF-invariant) and must reach
    the corpus probe as a broadcast semi join, never a shuffle."""
    plan = formatted_plan(SPECS["corpus_decontaminate"].builder(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_bm25_broadcasts_fixed_sides_only(spark):
    """BM25's doc-frequency table (fixed 4-term query vocab) and the 1-row
    corpus stats are the ONLY broadcast sides; the per-doc tf/dl tables
    scale with SF and must not be forced. No unbounded nested-loop join:
    the single BroadcastNestedLoopJoin allowed is the 1-row stats cross."""
    plan = formatted_plan(SPECS["text_bm25"].builder(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_inverted_index_bounds_postings_before_collect(spark):
    """The rn <= 12 filter must sit between the window and the list
    aggregation so per-term collected state is bounded at any corpus
    size — Window then Filter then the collect_list aggregate."""
    plan = formatted_plan(SPECS["text_inverted_index"].builder(spark, SF_SMOKE))
    assert "Window" in plan, plan
    assert "rn#" in plan and "<= 12" in plan, plan  # bounded before any collect
    assert "collect_list" in plan, plan


def test_repetition_agg_is_partial(spark):
    """The (doc_id, gram) count behind the top-bigram metric must map-side
    combine: partial_count before the exchange."""
    plan = formatted_plan(SPECS["text_repetition"].builder(spark, SF_SMOKE))
    assert "partial_count" in plan or "partial" in plan, plan


def test_runtime_bloom_filter_prunes_shuffle_join_probe_side(spark):
    """Engine capability: Spark's runtime row-level filtering (AQE bloom
    filter) injects a BloomFilterMightContain on the probe side of a
    shuffle join when the build side carries a selective filter — at
    100 TB this skips most of the fact scan's shuffle write for
    dim-filtered joins that are too big to broadcast. Thresholds are
    lowered here because the fixtures are tiny; the rewrite itself is
    what's asserted."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        # force a shuffle join: runtime filters exist precisely for the
        # joins that can't broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        from pyspark.sql import functions as F

        from spark_cherry_shuffle_service_spark.sources.catalog import table as _t

        li = _t(spark, SF_SMOKE, "lineitem")
        pt = _t(spark, SF_SMOKE, "part").filter(F.col("p_size") == 1)
        df = li.join(pt, li.l_partkey == pt.p_partkey).groupBy("p_brand").count()
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloomfilter" in plan.lower() or "might_contain" in plan.lower(), plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_stratified_sample_is_scan_local(spark):
    """corpus_stratified_sample is a pure per-row predicate over a bounded
    lang vocabulary: no joins, no aggregates, no exchanges — at 100 TB it
    runs at scan speed."""
    df = SPECS["corpus_stratified_sample"].builder(spark, SF_SMOKE)
    ops = plan_ops(df)
    assert count_ops(df, "Exchange") == 0, ops
    assert not any("Join" in op for op in ops), ops


def test_random_projection_is_one_pass(spark):
    """embedding_random_projection: per-row fold expressions only — no
    joins, no aggregation exchanges (the single repartition compensates the
    one-file fixture scan; a cluster scan is already multi-partition)."""
    df = SPECS["embedding_random_projection"].builder(spark, SF_SMOKE)
    ops = plan_ops(df)
    assert count_ops(df, "Exchange") <= 1, ops
    assert not any("Join" in op for op in ops), ops
    assert not any("HashAggregate" in op for op in ops), ops


@pytest.mark.parametrize("name", ["kmeans_assign", "kmeans_lloyd"])
def test_kmeans_assignment_is_windowless_projection(spark, name):
    """Round-11 rewrite (VERDICT r10 item 1): nearest-centroid assignment
    is array_min over a transformed struct array from ONE broadcast
    centroid row — a pure projection. The plan must carry no Window (the
    old N×K row_number argmin paid a partitionBy(vec_id) exchange+sort)
    and, for lloyd, no shuffle join back to the embeddings (pass 1 keeps
    the embedding through the projection)."""
    df = SPECS[name].builder(spark, SF_SMOKE)
    ops = plan_ops(df)
    assert not any("Window" in op for op in ops), ops
    assert not any(op.startswith(("SortMergeJoin", "ShuffledHashJoin")) for op in ops), ops
    # the broadcast argmin row is still a bounded BNLJ (registry sweep
    # entry asserted non-stale there)
    assert any("BroadcastNestedLoopJoin" in op for op in ops), ops


def test_contrastive_negatives_prefilter_precedes_window(spark):
    """The md5-prefix pool filter must land BEFORE the ranking window (it
    is the scale mechanism — the window sorts |corpus|/4, not |corpus|)."""
    from spark_cherry_shuffle_service_spark.plans.explain import formatted_plan

    df = SPECS["similarity_contrastive_negatives"].builder(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "Window" in plan
    # In formatted output children print after parents: the pool filter
    # (h < 4) must appear below/after the Window operator header.
    win_pos = plan.index("Window")
    assert "< 4" in plan[win_pos:] or "&lt; 4" in plan[win_pos:], plan


def test_bucketed_edge_table_makes_iteration_join_edge_side_exchange_free(spark):
    """The graph modules' documented 100 TB path (graph.py scale note,
    SCALE.md): bucket the edge table by src so each iteration's
    edges⋈ranks join re-reads the bucketing instead of re-shuffling the
    (large) edge side. Evidence: with edges bucketed on src, the WHOLE
    iteration joins with ZERO exchanges — the ranks table derives from the
    same bucketed table, so its distinct() satisfies its hash-partitioning
    requirement from the bucketing too."""
    from pyspark.sql import functions as F

    from spark_cherry_shuffle_service_spark.sources.catalog import table, write_bucketed

    li = table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (2 * F.col("l_suppkey")).alias("src"),
            (2 * F.col("o_custkey") + 1).alias("dst"),
        )
        .distinct()
    )
    write_bucketed(pairs, "edges_bkt", ["src"], 8)
    edges = spark.table("edges_bkt")
    ranks = (
        edges.select(F.col("src").alias("node")).distinct().withColumn("rank", F.lit(1_000_000))
    )
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Force a non-broadcast join so the exchange structure is visible
        # (at real scale ranks outgrows any broadcast threshold anyway).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = edges.join(ranks.hint("merge"), edges.src == ranks.node)
        n_exchanges = count_ops(joined, "Exchange")
        assert n_exchanges == 0, (n_exchanges, plan_ops(joined))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql("DROP TABLE IF EXISTS edges_bkt")


def test_cusum_windows_share_one_sort(spark):
    """events_cusum runs TWO window passes (prefix sum, then running min
    of the prefix) over the same (event_type, ts, event_id) ordering —
    the physical plan must contain exactly 2 Sorts: the ONE shared window
    sort plus the 5-row output sort. A third Sort would mean the second
    window re-sorted the partition (the claim in monitoring.py would be
    false)."""
    df = SPECS["events_cusum"].builder(spark, SF_SMOKE)
    assert count_ops(df, "Sort") == 2, formatted_plan(df)[:2000]


def test_rolling_zscore_single_window_sort(spark):
    """events_rolling_zscore computes count/sum/sum-of-squares over ONE
    frame: one window sort + the output sort, two exchanges total (window
    partition + final rollup)."""
    df = SPECS["events_rolling_zscore"].builder(spark, SF_SMOKE)
    assert count_ops(df, "Sort") == 2, formatted_plan(df)[:2000]
    assert count_ops(df, "Exchange") == 2, formatted_plan(df)[:2000]


def test_round5_ops_have_no_cartesian_products(spark):
    """None of the round-5 additions may degenerate into an all-pairs
    product — including the pair-generating ones (leakage, threshold
    sweep, trend pairs are day-bounded)."""
    for name in (
        "events_cusum",
        "events_rolling_zscore",
        "events_changepoint",
        "events_trend_mannkendall",
        "corpus_novelty",
        "corpus_cross_source_leakage",
        "dedup_threshold_sweep",
        "graph_bfs_levels",
        "graph_degree_histogram",
        "dedup_savings_by_source",
        "similarity_cluster_purity",
    ):
        df = SPECS[name].builder(spark, SF_SMOKE)
        assert count_ops(df, "CartesianProduct") == 0, name


def test_global_rank_queries_have_no_partitionless_window(spark):
    """The three former global-sort-window queries (VERDICT r5 "what's
    wrong" #1) now route through functions/ranking.py — their physical
    plans must contain ZERO partition-less Window nodes (the shape Spark
    warns about with `WindowExec: No Partition Defined`). Every Window
    left is partitioned by the boundary bucket id."""
    from spark_cherry_shuffle_service_spark.plans.explain import partitionless_windows

    for name in ("orders_rfm", "customer_revenue_deciles", "abc_classification"):
        df = SPECS[name].builder(spark, SF_SMOKE)
        assert partitionless_windows(df) == 0, name
        assert count_ops(df, "Window") >= 1, name  # decomposed, not windowless


def test_global_rank_helper_matches_single_reducer_window(spark):
    """with_global_rank == ROW_NUMBER() OVER (ORDER BY ...) bit-for-bit,
    including desc ordering, running sums and the arithmetic NTILE —
    chained twice to cover the multi-rank (orders_rfm) shape."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_cherry_shuffle_service_spark.functions.ranking import (
        ntile_expr,
        with_global_rank,
    )

    df = spark.range(5003).select(
        F.col("id"),
        F.md5(F.col("id").cast("string")).substr(1, 3).alias("v"),
        ((F.col("id") * 37) % 500).cast("long").alias("x"),
    )
    got = with_global_rank(
        df, [("v", "asc"), ("id", "asc")], rank_name="rk", running=(("x", "cx"),), n_name="n"
    )
    got = with_global_rank(got, [("x", "desc"), ("id", "asc")], rank_name="rk2")
    exp = df.select(
        "id",
        F.row_number().over(Window.orderBy("v", "id")).alias("rk_e"),
        F.sum("x")
        .over(Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cx_e"),
        F.row_number().over(Window.orderBy(F.col("x").desc(), "id")).alias("rk2_e"),
        F.ntile(7).over(Window.orderBy("v", "id")).alias("t7_e"),
    )
    j = got.withColumn("t7", ntile_expr("rk", "n", 7)).join(exp, "id")
    bad = j.filter(
        (F.col("rk") != F.col("rk_e"))
        | (F.col("cx") != F.col("cx_e"))
        | (F.col("rk2") != F.col("rk2_e"))
        | (F.col("t7") != F.col("t7_e"))
    ).count()
    assert bad == 0
    assert j.count() == 5003


def test_bucketed_band_index_makes_incremental_probe_corpus_side_exchange_free(spark):
    """dedup_incremental's documented 100 TB path (dedup.py scale note):
    the corpus band keys are a PRECOMPUTED bucketed table, so each
    incoming batch probes it without re-shuffling the (large) corpus
    side. Evidence: with the band index bucketed on (band, bkey), the
    probe join plans exactly ONE Exchange — the small batch side — and
    zero on the corpus side (same proof shape as the graph edge-table
    test above)."""
    from pyspark.sql import functions as F

    from spark_cherry_shuffle_service_spark.functions.text import minhash_signature, shingles3
    from spark_cherry_shuffle_service_spark.sources.catalog import table, write_bucketed

    sig = (
        table(spark, SF_SMOKE, "documents")
        .select("doc_id", minhash_signature(shingles3(F.col("text")), 16).alias("sig"))
    )
    banded = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda band: F.struct(
                    band.alias("band"),
                    F.md5(F.array_join(F.slice(F.col("sig"), band * 2 + 1, 2), "")).alias("bkey"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    write_bucketed(banded.filter(F.col("doc_id") % 7 != 0), "band_index_bkt", ["band", "bkey"], 8)
    corpus = spark.table("band_index_bkt")
    batch = banded.filter(F.col("doc_id") % 7 == 0)
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        probe = corpus.alias("a").join(
            batch.hint("merge").alias("b"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey")),
        )
        n_exchanges = count_ops(probe, "Exchange")
        assert n_exchanges == 1, (n_exchanges, plan_ops(probe))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql("DROP TABLE IF EXISTS band_index_bkt")


def test_global_windows_only_on_sf_invariant_grains(spark):
    """Registry-wide single-reducer audit: a partition-less ORDERED (or
    grand-total unordered) Window is allowed ONLY over grains that do
    not scale with SF — every other query must plan zero of them. The
    whitelist documents each bounded grain; growing it requires the same
    justification. (The three formerly-violating queries — orders_rfm,
    customer_revenue_deciles, abc_classification — and the round-6
    dedup_lsh_recall top-k rewrite must stay OFF this list.)"""
    from spark_cherry_shuffle_service_spark.plans.explain import partitionless_windows

    bounded_grain_whitelist = {
        # grand MAX over the per-source aggregate (sources: fixed vocabulary)
        "corpus_temperature_sample",
        # cross-bucket running sum over <= 1000 score buckets (SF-invariant)
        "corpus_token_budget",
        # two cumulative series on the 1997 daily grain (<= 365 rows each)
        "cumulative_compare",
        # RANK over the 25-nation aggregate (dimension-sized)
        "sql_text_cte_window",
        # grand total over the 5x3 priority-status contingency
        "stats_chi2",
        # VERBATIM reference texts (we cannot add PARTITION BY): q44 ranks
        # the per-item avg-profit aggregate of ONE store (item-grain,
        # sqrt-entity growth under genscale v2); q49's six rank windows
        # each rank the per-item return-ratio aggregate of one
        # channel-month cohort (item-grain, single month) — both window
        # inputs are pre-aggregated far below fact cardinality.
        "sql_text_tpcds_q44",
        "sql_text_tpcds_q49",
        "sql_text_tpcds_q49_v27",
    }
    offenders = {}
    for name, spec in SPECS.items():
        n = partitionless_windows(spec.builder(spark, SF_SMOKE))
        if n and name not in bounded_grain_whitelist:
            offenders[name] = n
    assert not offenders, offenders


def test_global_rank_helper_edge_cases(spark):
    """Empty frame, n < k NTILE, single row, and all-duplicate sort keys
    (boundaries dedupe to one bucket; the unique tiebreak column keeps
    the order total) — the degenerate shapes of the decomposition."""
    from pyspark.sql import functions as F

    from spark_cherry_shuffle_service_spark.functions.ranking import (
        ntile_expr,
        with_global_rank,
    )

    e = spark.range(0).select(F.col("id"), (F.col("id") % 3).alias("x"))
    r = with_global_rank(
        e, [("x", "asc"), ("id", "asc")], rank_name="rk", running=(("x", "cx"),), n_name="n"
    )
    assert r.count() == 0

    t = spark.range(3).select(F.col("id"), F.col("id").alias("x"))
    r2 = with_global_rank(t, [("x", "asc"), ("id", "asc")], rank_name="rk", n_name="n")
    rows = r2.select("rk", ntile_expr("rk", "n", 5).alias("t5")).orderBy("rk").collect()
    assert [(x["rk"], x["t5"]) for x in rows] == [(1, 1), (2, 2), (3, 3)]

    s = spark.range(1).select(F.col("id"), F.lit(7).cast("long").alias("x"))
    row = with_global_rank(
        s, [("x", "asc"), ("id", "asc")], rank_name="rk", running=(("x", "cx"),), n_name="n"
    ).first()
    assert (row["rk"], row["cx"], row["n"]) == (1, 7, 1)

    d = spark.range(2000).select(F.col("id"), F.lit(5).cast("long").alias("x"))
    r4 = with_global_rank(d, [("x", "asc"), ("id", "asc")], rank_name="rk")
    bad = (
        r4.join(d.select("id", (F.col("id") + 1).alias("want")), "id")
        .filter("rk != want")
        .count()
    )
    assert bad == 0


def test_multi_rank_helper_matches_single_reducer_windows(spark):
    """with_global_ranks (one shared sample/counts pass for N orders)
    must equal per-order ROW_NUMBER() windows bit-for-bit, including a
    desc order and the shared total count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_cherry_shuffle_service_spark.functions.ranking import with_global_ranks

    df = spark.range(4001).select(
        "id",
        F.md5(F.col("id").cast("string")).substr(1, 3).alias("v"),
        ((F.col("id") * 13) % 700).cast("long").alias("x"),
    )
    got = with_global_ranks(
        df,
        [
            ("rv", [("v", "asc"), ("id", "asc")]),
            ("rx", [("x", "desc"), ("id", "asc")]),
        ],
        n_name="n",
    )
    exp = df.select(
        "id",
        F.row_number().over(Window.orderBy("v", "id")).alias("rv_e"),
        F.row_number().over(Window.orderBy(F.col("x").desc(), "id")).alias("rx_e"),
    )
    j = got.join(exp, "id")
    assert j.filter("rv != rv_e or rx != rx_e or n != 4001").count() == 0
    assert j.count() == 4001


def test_global_rank_buckets_stay_balanced_under_skew(spark):
    """The decomposition's 100 TB premise is bucket BALANCE: the md5
    sample's boundaries must split even a heavily skewed sort key into
    near-equal buckets (each bucket is one window task). Key = u⁴ over
    an md5-uniform u — ~68% of 1M rows land in the bottom 20% of the
    value range — and the max/mean bucket-size ratio must stay < 2
    (measured ~1.2; a naive equal-WIDTH split would put most rows in
    one bucket). The unique tiebreak column keeps heavy duplicate runs
    splittable."""
    import statistics

    from pyspark.sql import functions as F

    from spark_cherry_shuffle_service_spark.functions import ranking

    u = F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10).cast(
        "double"
    ) / 65536.0
    df = spark.range(1_000_000).select(
        "id", F.floor(F.pow(u, 4) * 1000).cast("long").alias("v")
    )
    order = [("v", "asc"), ("id", "asc")]
    bounds = ranking._collect_boundaries(df, order, 32, 200)
    sizes = [
        r["n"]
        for r in df.withColumn("b", ranking._bucket_expr(order, bounds))
        .groupBy("b")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(sizes) >= 16, sizes  # boundaries dedupe only under extreme ties
    ratio = max(sizes) / statistics.mean(sizes)
    assert ratio < 2.0, (ratio, sorted(sizes)[-5:])


def test_ranking_persist_released(spark):
    """VERDICT r6 item 4: a build through with_global_rank(s) persists its
    input for the build's duration; after the final action +
    release_persisted() (which the compare harness and bench.py call
    per-query) the session must carry ZERO net-new persisted frames.
    Asserted for all three ranking-routed queries via the JVM-side
    persistent-RDD map."""
    from spark_cherry_shuffle_service_spark.functions.ranking import release_persisted
    from spark_cherry_shuffle_service_spark.sources.catalog import write_noop

    def n_persisted() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    release_persisted()  # drain anything a prior test left behind
    before = n_persisted()
    for name in ("orders_rfm", "customer_revenue_deciles", "abc_classification"):
        df = SPECS[name].builder(spark, SF_SMOKE)
        assert n_persisted() > before, f"{name}: build should persist its input"
        write_noop(df)  # the final action, as in compare/bench
        released = release_persisted()
        assert released >= 1, name
        assert n_persisted() == before, name


def test_ranking_total_order_contract_enforced(spark):
    """ADVICE r6: a caller violating the total-order contract (duplicate
    key tuples) must fail LOUD at build time — duplicated md5 sample tags
    would otherwise silently collapse boundary picks and bucket balance.
    A valid order over the same data still builds."""
    from pyspark.sql import functions as F

    from spark_cherry_shuffle_service_spark.functions.ranking import (
        release_persisted,
        with_global_rank,
        with_global_ranks,
    )

    df = spark.range(4000).select("id", (F.col("id") % 5).cast("long").alias("x"))
    with pytest.raises(ValueError, match="total order"):
        with_global_rank(df, [("x", "asc")], rank_name="rk")
    with pytest.raises(ValueError, match="total order"):
        with_global_ranks(df, [("rk", [("x", "asc")])])
    ok = with_global_rank(df, [("x", "asc"), ("id", "asc")], rank_name="rk")
    assert ok.count() == 4000
    release_persisted()


def test_exact_unbounded_queries_name_a_scale_twin(spark):
    """VERDICT r6 item 6: every query tagged `exact-unbounded` (exact
    aggregation whose per-group state grows with the data — exact
    percentile value→count buffers) must name an existing registered
    scale_twin demonstrating its bounded 100 TB substitute, and every
    scale_twin anywhere must resolve. The pairing is thereby machine-
    visible from all_specs(), not prose."""
    missing = {}
    for name, spec in SPECS.items():
        if "exact-unbounded" in spec.tags and not spec.scale_twin:
            missing[name] = "tagged exact-unbounded but no scale_twin"
        if spec.scale_twin is not None:
            if spec.scale_twin == name:
                missing[name] = "scale_twin points at itself"
            elif spec.scale_twin not in SPECS:
                missing[name] = f"scale_twin {spec.scale_twin!r} not registered"
    assert not missing, missing
    # The tag is in active use — the audit must never pass vacuously.
    tagged = [n for n, s in SPECS.items() if "exact-unbounded" in s.tags]
    assert len(tagged) >= 5, tagged


def test_heavy_hitters_shuffles_only_where_designed(spark):
    """heavy_hitters_mg's whole point is bounded shuffle: exactly four
    shuffle exchanges — the MG input spread (the one Python-side pass),
    the candidate DISTINCT, the candidate-only count, and the scalar
    total — and the candidates enter the verify pass by BROADCAST. The
    verify and total passes must read the scan directly (routing them
    through the MG repartition added two full-row exchanges; this pins
    the fix)."""
    df = SPECS["heavy_hitters_mg"].builder(spark, SF_SMOKE)
    ops = plan_ops(df)
    # <= 4: the MG input spread, the candidate DISTINCT, and at most the
    # candidate-count + scalar-total shuffles (those two vanish entirely
    # when the scan's partitioning already satisfies the clustering, as
    # with single-file fixtures — the point is they are never MORE).
    assert sum(1 for o in ops if o == "Exchange") <= 4, ops
    assert "BroadcastHashJoin" in ops, ops
    # The one full-row exchange feeds the Python MG pass directly.
    assert ops[ops.index("MapInPandas") - 1] == "Exchange", ops


def test_verbatim_tpcds_plans_have_no_cartesians(spark):
    """Round-9 continuation: the physical plan of EVERY verbatim TPC-DS
    query is cartesian-free, and the only BroadcastNestedLoopJoins are
    the corpus's own single-row aggregate crosses — q28's six bucket
    subqueries, q61/q90's two-scalar ratios, q88's eight time-band
    counts, q77/q77a's grand-total catalog-returns CTE, and v2.7 q22's
    scalar average — each a 1-row side, i.e. a broadcast of a constant,
    which is exactly the right plan at any SF. A BNLJ anywhere else (the
    q72 blowup class) fails loudly."""
    one_row_cross_whitelist = {
        "sql_text_tpcds_q22_v27",
        "sql_text_tpcds_q28",
        "sql_text_tpcds_q61",
        "sql_text_tpcds_q77",
        "sql_text_tpcds_q77a",
        "sql_text_tpcds_q88",
        "sql_text_tpcds_q90",
    }
    offenders = {}
    for name, spec in SPECS.items():
        if not name.startswith("sql_text_tpcds"):
            continue
        df = spec.builder(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in one_row_cross_whitelist:
            offenders[name] = "BroadcastNestedLoopJoin"
    assert not offenders, offenders
    # The whitelist must stay honest: every entry still builds a plan
    # with a BNLJ (no stale rows).
    for name in one_row_cross_whitelist:
        plan = SPECS[name].builder(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan, name


# ---------------------------------------------------------------------------
# Registry-wide explain-invariant sweep (VERDICT r9 item 7): promote the
# TPC-DS cartesian/BNLJ guard to ALL registered queries, plus a broadcast-
# hint grain audit — explain-only, no execution.
# ---------------------------------------------------------------------------

#: Queries whose plan MAY contain a CartesianProduct: the explicitly-
#: guarded cartesian operator only (bounded dims by contract; at fixture
#: sizes the planner usually broadcasts it instead, so presence is not
#: asserted — the operator's own test covers its semantics).
_CARTESIAN_WHITELIST = {"cross_join"}

#: Queries whose BNLJ build side is bounded by a CONSTANT FILTER rather
#: than an aggregate/limit (structurally invisible to _unbounded_bnlj):
#: the similarity family broadcasts its fixed probe/query-sample set
#: (`vec_id < n_queries` over embeddings — SF-invariant by contract,
#: SCALE.md), kmeans broadcasts the fixed centroid table, and
#: text_fuzzy_lookup broadcasts its fixed query vocabulary. Each family's
#: dedicated plan tests assert the candidate bounding; entries here are
#: asserted non-stale (a BNLJ must actually be present).
_BNLJ_FILTER_BOUNDED = {
    "dedup_crossmodal",
    "embedding_truncation_fidelity",
    "global_sales_opportunity",
    "important_parts",
    "kmeans_assign",
    "kmeans_lloyd",
    "search_hybrid_rrf",
    "similarity_ann_recall",
    "similarity_cluster_purity",
    "similarity_contrastive_negatives",
    "similarity_ivf",
    "similarity_ivf_nprobe_sweep",
    "similarity_ivfpq",
    "similarity_ivfpq_rerank",
    "similarity_pq_adc",
    "similarity_topk",
    "text_fuzzy_lookup",
}

#: Tables whose row count is SF-invariant by generator construction
#: (sources/tpcds_star.py fixed-cardinality dims + the TPC-H tiny dims):
#: a BNLJ build side scanning only these is a broadcast of a constant.
_SF_INVARIANT_TABLES = frozenset(
    {
        "nation", "region", "date_dim", "time_dim", "store", "warehouse",
        "call_center", "reason", "ship_mode", "income_band", "web_page",
        "household_demographics", "customer_demographics", "promotion",
        "catalog_page", "web_site",
    }
)

#: Markers that bound a broadcast subtree independently of SF: an
#: aggregate (the 1-row scalar-total / bounded-grain cross class), an
#: explicit limit, a literal local relation (centroid/vocab tables), or
#: a constant range.
_BOUNDED_MARKERS = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "CollectLimit",
    "TakeOrderedAndProject",
    "GlobalLimit",
    "LocalTableScan",
    "ReusedExchange",
    "Range (",
)


import re as _re

_TREE_PREFIX = _re.compile(r"^[\s:+\-]*")


def _plan_depth(line: str) -> int:
    """Length of the tree-drawing prefix ('   :  +- ') — the node label
    may itself start with a codegen id ('*(3) HashAggregate'), which must
    not count as indentation."""
    return _TREE_PREFIX.match(line).end()


def _unbounded_bnlj(physical: str) -> list[str]:
    """Every BroadcastNestedLoopJoin in the plan must broadcast a BOUNDED
    side: somewhere beneath its BroadcastExchange there is an aggregate /
    limit / literal relation, so the nested loop streams against a
    constant-size build no matter the SF (the orders_basket_lift /
    TPC-DS scalar-subquery cross class). A BNLJ broadcasting a raw or
    merely-filtered scan (the q72 blowup class) is returned as an
    offender."""
    lines = physical.splitlines()
    bad: list[str] = []
    for i, line in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in line:
            continue
        d = _plan_depth(line)
        subtree = []
        for sub in lines[i + 1 :]:
            if _plan_depth(sub) <= d and sub.strip():
                break
            subtree.append(sub)
        # The BNLJ's DIRECT children render exactly one tree level deeper;
        # pick the BUILD side (the streamed side's own broadcast dim joins
        # must not be mistaken for the build subtree).
        child_idx = [j for j, sub in enumerate(subtree) if _plan_depth(sub) == d + 3]
        if len(child_idx) < 2:
            bad.append(line.strip()[:80])
            continue
        build = child_idx[0] if "BuildLeft" in line else child_idx[1]
        end = child_idx[child_idx.index(build) + 1] if build != child_idx[-1] else len(subtree)
        bsub = subtree[build:end]
        ok = any(m in sub for sub in bsub for m in _BOUNDED_MARKERS)
        if not ok:
            # SF-invariant dim scans are broadcasts of constants too
            # (cross_join's region side; v2.7 q22's deliberate warehouse
            # cross — the variant drops the join condition by design).
            scans = [
                m.group(1)
                for sub in bsub
                for m in [_re.search(r"/(\w+)\.parquet", sub)]
                if m
            ]
            ok = bool(scans) and all(t in _SF_INVARIANT_TABLES for t in scans)
        if not ok:
            bad.append(line.strip()[:80])
    return bad

#: Tables whose size is SF-invariant by generator construction: the
#: TPC-H-ish tiny dims plus every star dimension gen_* emits at fixed
#: cardinality (sources/tpcds_star.py). Identified in the analyzed plan
#: by their column-name prefixes.
_SF_INVARIANT_PREFIXES = (
    "n_", "r_",  # nation / region / reason
    "d_", "t_",  # date_dim / time_dim
    "w_", "cc_", "sm_", "ib_", "wp_",  # warehouse .. web_page
    "hd_", "cd_",  # household/customer demographics
    "web_",  # web_site
    "cp_",  # catalog_page
)
#: Disambiguations where a prefix collides across a scaling and an
#: SF-invariant table: full column names decide.
_SCALING_MARKERS = (
    "l_orderkey", "o_orderkey", "c_custkey", "c_customer_sk", "ca_address_sk",
    "p_partkey", "ps_partkey", "s_suppkey", "event_id", "doc_id",
    "ss_item_sk", "cs_item_sk", "ws_item_sk", "sr_item_sk", "cr_item_sk",
    "wr_item_sk", "inv_item_sk", "i_item_sk",
)


def _broadcast_hint_violations(df) -> list[str]:
    """Parse the ANALYZED logical plan for ResolvedHint(broadcast)
    subtrees and flag any whose subtree scans a scaling relation without
    an intervening Aggregate. An Aggregate beneath the hint means the
    broadcast side is a reduced grain — whether THAT grain is bounded is
    policed by the dedicated per-operator tests (bm25/decontaminate/
    centroids/...); this sweep catches the cruder mistake of hinting a
    raw or merely-filtered scaling table (SCALE.md's rule)."""
    plan = df._jdf.queryExecution().analyzed().toString()
    lines = plan.splitlines()

    def depth(line: str) -> int:
        for i, ch in enumerate(line):
            if ch not in " :+-":
                return i
        return len(line)

    bad: list[str] = []
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line or "broadcast" not in line.lower():
            continue
        d = depth(line)
        # Aggregation is tracked PER BRANCH (ADVICE r10): a stack of the
        # depths where an Aggregate/Limit/Deduplicate appeared. A deeper
        # Relation is excused only while some ANCESTOR reducer is still on
        # the stack — a reducer on a sibling branch pops off as soon as the
        # walk returns to its depth, so a hint over join(aggregate, raw
        # scaling scan) now flags the raw scan regardless of render order.
        agg_depths: list[int] = []
        for sub in lines[i + 1 :]:
            dd = depth(sub)
            if dd <= d:
                break
            while agg_depths and agg_depths[-1] >= dd:
                agg_depths.pop()
            if "Aggregate" in sub or "GlobalLimit" in sub or "Deduplicate" in sub:
                # reduced grain below this point: out of scope here
                agg_depths.append(dd)
            if "Relation" in sub and not agg_depths:
                cols = sub.split("[", 1)[-1].split("]", 1)[0]
                first = cols.split(",", 1)[0].split("#", 1)[0].strip()
                scaling = any(m in sub for m in _SCALING_MARKERS) or not first.startswith(
                    _SF_INVARIANT_PREFIXES
                )
                if scaling:
                    bad.append(f"broadcast hint over scaling relation cols=[{cols[:60]}]")
        # (hints over range()/LocalRelation/VALUES have no Relation: pass)
    return bad


@pytest.mark.parametrize("name", sorted(SPECS))
def test_registry_plan_invariants(spark, name):
    """Every registered query, explain-only: no CartesianProduct (the
    guarded `cross_join` whitelisted and asserted PRESENT, so the
    whitelist can't go stale), every BroadcastNestedLoopJoin broadcasts a
    provably bounded side, and no broadcast hint over an unreduced
    scaling relation. The TPC-DS corpus additionally carries the stricter
    named-whitelist guard (test_verbatim_tpcds_plans_have_no_cartesians)."""
    spec = SPECS[name]
    df = spec.builder(spark, SF_SMOKE)
    physical = df._jdf.queryExecution().executedPlan().toString()
    if name not in _CARTESIAN_WHITELIST:
        assert "CartesianProduct" not in physical, name
    if name in _BNLJ_FILTER_BOUNDED:
        # Filter-bounded probe/query/centroid broadcasts: the hint and
        # the BNLJ are over a constant-filter slice the structural audit
        # cannot see; the family's dedicated plan tests assert the
        # bounding. Presence asserted so the entry can't go stale.
        assert "BroadcastNestedLoopJoin" in physical or "BroadcastExchange" in physical, (
            f"{name}: stale _BNLJ_FILTER_BOUNDED entry (no broadcast in plan)"
        )
    else:
        bnlj_bad = _unbounded_bnlj(physical)
        assert not bnlj_bad, f"{name}: BNLJ with unbounded build side: {bnlj_bad}"
        hint_bad = _broadcast_hint_violations(df)
        assert not hint_bad, f"{name}: {hint_bad}"
