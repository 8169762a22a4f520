"""Scale-path operators: properties that can't be oracle-hash-checked
(approximate sketches, LSH recall) get bounded-error/recall tests instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cherry_shuffle_service_spark.plans.registry import all_specs
from spark_cherry_shuffle_service_spark.sources.catalog import table
from tests.conftest import SF_CORRECT

SPECS = all_specs()


def test_approx_distinct_within_tolerance(spark):
    approx = {
        r["source"]: r["approx_unique_docs"]
        for r in SPECS["text_approx_distinct"].builder(spark, SF_CORRECT).collect()
    }
    exact = {
        r["source"]: r["n"]
        for r in table(spark, SF_CORRECT, "documents")
        .groupBy("source")
        .agg(F.countDistinct(F.md5(F.trim(F.col("text")))).alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for src, a in approx.items():
        assert abs(a - exact[src]) / exact[src] < 0.1, (src, a, exact[src])


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """Every pair the LSH path reports must be a true near-dup, and it must
    find the overwhelming majority of true pairs at its threshold (LSH is
    probabilistic; band parameters target ~1.0 recall at j≥0.7)."""
    from spark_cherry_shuffle_service_spark.functions.text import shingles3

    lsh_pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in SPECS["dedup_minhash_lsh"].builder(spark, SF_CORRECT).collect()
    }
    docs = (
        table(spark, SF_CORRECT, "documents")
        .select("doc_id", shingles3(F.col("text")).alias("sh"))
    )
    a = docs.select(F.col("doc_id").alias("da"), F.col("sh").alias("sa"))
    b = docs.select(F.col("doc_id").alias("db"), F.col("sh").alias("sb"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    j = inter.cast("double") / (F.size("sa") + F.size("sb") - inter)
    true_pairs = {
        (r["da"], r["db"]): r["j"]
        for r in a.join(b, F.col("da") < F.col("db"))
        .select("da", "db", j.alias("j"))
        .filter(F.col("j") >= 0.7)
        .collect()
    }
    # precision: all reported pairs are genuinely >= the verify threshold
    assert all(v >= 0.3 for v in lsh_pairs.values())
    # recall at high similarity
    found = sum(1 for p in true_pairs if p in lsh_pairs)
    assert found >= 0.9 * len(true_pairs), (found, len(true_pairs))


def test_lsh_buckets_group_similar_vectors(spark):
    """Sign-LSH sanity: bucket histogram covers all vectors exactly once,
    and bucket ids fit the plane-count bit budget."""
    rows = SPECS["similarity_lsh_buckets"].builder(spark, SF_CORRECT).collect()
    total = sum(r["n_vectors"] for r in rows)
    n = table(spark, SF_CORRECT, "embeddings").count()
    assert total == n
    assert all(0 <= r["bucket"] < 2**8 for r in rows)


def test_pandas_udf_cosine_matches_jvm_expression(spark):
    """UDF escape hatch (SURVEY.md §2.11): an Arrow-vectorized pandas_udf
    dot product must agree with the JVM-side fold used by the similarity
    operators — validates the documented 'drop to pandas_udf only when
    built-ins cannot express it' path."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from spark_cherry_shuffle_service_spark.functions.vectors import dot

# 'from __future__ import annotations' stringifies hints, which
    # pandas_udf can't infer — declare the scalar UDF without annotations.
    def _dot(a, b):
        import numpy as np

        return pd.Series(
            [float(np.dot(np.asarray(x, dtype="float64"), np.asarray(y, dtype="float64")))
             for x, y in zip(a, b)]
        )

    dot_udf = pandas_udf(_dot, "double")

    emb = table(spark, SF_CORRECT, "embeddings").limit(50)
    both = emb.select(
        dot(F.col("embedding"), F.col("embedding")).alias("jvm"),
        dot_udf(F.col("embedding"), F.col("embedding")).alias("py"),
    ).collect()
    for r in both:
        assert abs(r["jvm"] - r["py"]) <= 1e-9 * max(1.0, abs(r["jvm"]))
