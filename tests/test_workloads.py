"""Workload-parity tests with closed-form expected counts
(SURVEY.md §5 item 3; FIXTURES.md 'workload-parity synthetic inputs')."""

from __future__ import annotations

from spark_cherry_shuffle_service_spark.operators.workloads import (
    group_count,
    skewed_pairs,
    synthetic_pairs,
)


def test_synthetic_counts_closed_form(spark):
    p, n = 8, 4000
    res = {r["key"]: r["n"] for r in group_count(synthetic_pairs(spark, n, p)).collect()}
    # ids run 1+p .. n+p → each residue class gets exactly n/p rows
    assert len(res) == p
    assert all(v == n // p for v in res.values()), res


def test_skewed_counts_closed_form(spark):
    p, n, k = 8, 4000, 0.8
    res = {r["key"]: r["n"] for r in group_count(skewed_pairs(spark, n, p, k)).collect()}
    hot = int(k * n)
    # key 1 gets the k·n forced rows plus its modulo share of the rest
    assert res[1] >= hot
    assert sum(res.values()) == n
    non_hot = {kk: v for kk, v in res.items() if kk != 1}
    assert all(v <= n // p for v in non_hot.values())


def test_value_payload_shape(spark):
    rows = synthetic_pairs(spark, 100, 4).select("value").limit(5).collect()
    assert all(len(r["value"]) == 100 for r in rows)  # 100-char ASCII payload


def test_workload_scale_smoke_5m_rows(spark):
    """The reference's experiment scale starts at 10M rows/GB
    (synthetic_workload.py:24, README.md:127); run half that through the
    generator + keyed count. Map-side combine means the shuffle carries one
    partial per (key, partition) — 3.2k rows for 5M inputs — which is why
    this completes in seconds and why the same plan holds at 100 TB."""
    n, p = 5_000_000, 32
    counts = {r["key"]: r["n"] for r in group_count(synthetic_pairs(spark, n, p)).collect()}
    assert sum(counts.values()) == n
    assert len(counts) == p
    # closed form: ids [1+p, n+p] → each key k gets n/p rows when p | n
    assert all(v == n // p for v in counts.values())


def test_mappartitions_topk_matches_declarative(spark):
    """Tier-(c) escape hatch (raw mapPartitions heaps) must agree with the
    declarative orderBy+limit it exists to replace."""
    from pyspark.sql import functions as F

    from spark_cherry_shuffle_service_spark.functions.partitions import partition_topk
    from spark_cherry_shuffle_service_spark.sources.catalog import table
    from tests.conftest import SF_SMOKE

    orders = table(spark, SF_SMOKE, "orders").repartition(8)
    got = sorted(
        (r["o_totalprice"], r["o_orderkey"])
        for r in partition_topk(orders, "o_totalprice", 15).collect()
    )
    want = sorted(
        (r["o_totalprice"], r["o_orderkey"])
        for r in orders.orderBy(F.col("o_totalprice").desc()).limit(15).collect()
    )
    assert [p for p, _ in got] == [p for p, _ in want]


def test_rdd_join_parity_with_dataframe(spark):
    """The reference's (commented-out) RDD self-join (synthetic_workload.py:30,
    SURVEY.md §2.3 'RDD join'): rdd.join(rdd) semantics == DataFrame inner
    join on key, per-key pair counts identical."""
    p, n = 4, 120
    pairs = spark.sparkContext.parallelize(range(1 + p, n + 1 + p), p).map(
        lambda x: (x % p, x)
    )
    rdd_counts: dict = {}
    for k, _ in pairs.join(pairs).collect():
        rdd_counts[k] = rdd_counts.get(k, 0) + 1

    from pyspark.sql import functions as F

    df = spark.createDataFrame(pairs, "key long, v long")
    joined = df.alias("a").join(df.alias("b"), "key").groupBy("key").agg(
        F.count(F.lit(1)).alias("n")
    )
    df_counts = {r["key"]: r["n"] for r in joined.collect()}
    assert rdd_counts == df_counts
    assert all(v == (n // p) ** 2 for v in df_counts.values())


def test_salted_group_count_equals_plain(spark):
    """Salted two-phase aggregation is semantics-preserving on a skewed
    input (k=0.8 of rows on key 1)."""
    from spark_cherry_shuffle_service_spark.operators.workloads import (
        salted_group_count,
        skewed_pairs,
    )

    pairs = skewed_pairs(spark, 1000, 4, 0.8)
    plain = {r["key"]: r["n"] for r in group_count(pairs).collect()}
    salted = {r["key"]: r["n"] for r in salted_group_count(pairs, salt=8).collect()}
    assert salted == plain
    assert salted[1] >= 800  # the hot key really is hot


def test_rdd_lambda_parity_with_dataframe(spark):
    """The reference's only UDF mechanism is Python lambdas over RDDs
    (synthetic_workload.py:27-35, SURVEY.md §2.11). Semantics parity:
    groupByKey().mapValues(len) == DataFrame groupBy().count()."""
    p, n = 4, 400
    rdd_counts = dict(
        spark.sparkContext.parallelize(range(1 + p, n + 1 + p), p)
        .map(lambda x: (x % p, "v" * 10))
        .groupByKey()
        .mapValues(len)
        .collect()
    )
    df_counts = {
        r["key"]: r["n"] for r in group_count(synthetic_pairs(spark, n, p)).collect()
    }
    assert rdd_counts == df_counts
