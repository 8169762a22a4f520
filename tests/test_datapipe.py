"""Training-data pipeline invariants (operators/datapipe.py) beyond the
DuckDB differential: the properties a production pipeline relies on —
partition completeness, token conservation, packing density, and
parallelism-invariance of hash-deterministic sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cherry_shuffle_service_spark.plans.registry import all_specs
from spark_cherry_shuffle_service_spark.sources.catalog import table
from tests.conftest import SF_CORRECT

SPECS = all_specs()


def test_dataset_split_partitions_the_corpus(spark):
    """Every document lands in exactly one split; 80/10/10 targets hit
    within hash-binomial tolerance."""
    docs = table(spark, SF_CORRECT, "documents")
    total = docs.count()
    rows = {r["split"]: r for r in SPECS["dataset_split"].builder(spark, SF_CORRECT).collect()}
    assert set(rows) == {"train", "val", "test"}
    assert sum(r["n_docs"] for r in rows.values()) == total
    assert sum(r["total_chars"] for r in rows.values()) == docs.agg(F.sum("n_chars")).first()[0]
    assert 0.7 * total <= rows["train"]["n_docs"] <= 0.9 * total


def test_pack_sequences_conserves_docs_and_tokens(spark):
    """Packing is a partition of the corpus: bin doc-counts and token
    totals sum to the corpus totals, and cumulative fill per bucket means
    every non-final bin chain stays ≥ the 512-token budget."""
    docs = table(spark, SF_CORRECT, "documents")
    toks_total = docs.agg(
        F.sum(F.size(F.split(F.trim(F.col("text")), " +"))).alias("t")
    ).first()["t"]
    bins = SPECS["pack_sequences"].builder(spark, SF_CORRECT).collect()
    assert sum(r["n_docs"] for r in bins) == docs.count()
    assert sum(r["bin_tokens"] for r in bins) == toks_total
    # Cumulative-floor packing: within a bucket, tokens through bin k
    # (k < last) total >= 512*(k+1) — bins are dense, not sparse.
    by_bucket: dict[int, list] = {}
    for r in bins:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bucket, rows in by_bucket.items():
        rows.sort(key=lambda r: r["bin_id"])
        # bin ids are contiguous from 0
        assert [r["bin_id"] for r in rows] == list(range(len(rows))), bucket
        cum = 0
        for r in rows[:-1]:
            cum += r["bin_tokens"]
            assert cum >= 512 * (r["bin_id"] + 1), (bucket, r["bin_id"], cum)


def test_hash_sampling_is_parallelism_invariant(spark):
    """The sample is a pure function of doc_id: identical membership no
    matter how the input is partitioned (the property df.sample lacks)."""
    base = SPECS["sample_hash"].builder(spark, SF_CORRECT)
    ids = sorted(r["doc_id"] for r in base.collect())

    docs = table(spark, SF_CORRECT, "documents").repartition(7)
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
    again = sorted(r["doc_id"] for r in docs.filter(h % 10 == 0).collect())
    assert ids == again
    # ~10% with binomial slack
    n = table(spark, SF_CORRECT, "documents").count()
    assert 0.05 * n <= len(ids) <= 0.15 * n


def test_stratified_sample_quota_per_language(spark):
    """Exactly min(quota, stratum size) rows per language, no duplicates."""
    out = SPECS["sample_stratified"].builder(spark, SF_CORRECT).collect()
    docs = table(spark, SF_CORRECT, "documents")
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    per_lang: dict[str, list] = {}
    for r in out:
        per_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert set(per_lang) == set(sizes)
    for lang, ids in per_lang.items():
        assert len(ids) == len(set(ids)) == min(20, sizes[lang]), lang


def test_corpus_filter_funnel_is_monotone(spark):
    r = SPECS["corpus_filter_funnel"].builder(spark, SF_CORRECT).first()
    assert r["n_total"] >= r["n_lang_ok"] >= r["n_len_ok"] >= r["n_quality_ok"] > 0


def test_mixture_weights_rebalance_to_uniform(spark):
    """token_share sums to 1; applying mix_weight equalizes expected
    token mass across sources (weight·share constant)."""
    rows = SPECS["corpus_mixture"].builder(spark, SF_CORRECT).collect()
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-3
    masses = [r["mix_weight"] * r["src_tokens"] for r in rows]
    assert max(masses) - min(masses) < 0.01 * max(masses)


def test_end_to_end_training_pipeline(spark, tmp_path):
    """Composition smoke for the full pipeline: quality filter → exact
    dedup → hash split → pack → write partitioned by split → read back.
    Each stage is individually oracle-checked; this proves they compose
    (schemas line up, no stage breaks another's invariants) and that the
    sink layout supports split-pruned reads."""
    from pyspark.sql import Window

    docs = table(spark, SF_CORRECT, "documents")
    toks = F.split(F.trim(F.col("text")), " +")
    survivors = docs.filter(
        F.col("lang").isin("en", "de", "fr")
        & F.col("n_chars").between(100, 2000)
        & (F.size(F.array_distinct(toks)) >= 0.4 * F.size(toks))
    )
    # exact dedup: keep lowest doc_id per md5(trim(text))
    w = Window.partitionBy(F.md5(F.trim(F.col("text")))).orderBy("doc_id")
    deduped = survivors.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    # hash split + token count
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
    bucket = h % 100
    staged = deduped.select(
        "doc_id",
        "lang",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
        F.size(toks).alias("n_tokens"),
    )
    out = str(tmp_path / "corpus")
    staged.write.mode("overwrite").partitionBy("split").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == deduped.count() > 0
    assert set(r["split"] for r in back.select("split").distinct().collect()) <= {"train", "val", "test"}
    # split-pruned read: partition filter reaches the scan
    from spark_cherry_shuffle_service_spark.plans.explain import formatted_plan

    train = back.filter(F.col("split") == "train")
    plan = formatted_plan(train)
    assert "PartitionFilters" in plan and "split" in plan.split("PartitionFilters", 1)[1]
    # deterministic: re-running the pipeline assigns identical splits
    again = staged.groupBy("split").count().collect()
    assert {r["split"]: r["count"] for r in again} == {
        r["split"]: r["count"] for r in back.groupBy("split").count().collect()
    }
