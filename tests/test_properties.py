"""Property-based tests (hypothesis): the determinism and equivalence
invariants the whole oracle strategy rests on.

- dsum is bit-identical at ANY partitioning (the registry's
  ROUND→DECIMAL→SUM→DOUBLE convention — plans/registry.py docstring).
- salted two-phase aggregation ≡ plain aggregation for arbitrary key
  distributions (workloads.py scale path).

Hypothesis drives the *data shape*; each example runs through real Spark
jobs, so examples are kept small and deadline is disabled.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from spark_cherry_shuffle_service_spark.functions.aggregates import dsum
from spark_cherry_shuffle_service_spark.operators.workloads import (
    group_count,
    salted_group_count,
)

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    values=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=1,
        max_size=200,
    ),
    parts=st.sampled_from([1, 3, 8]),
)
@_slow
def test_dsum_is_partitioning_invariant(spark, values, parts):
    df1 = spark.createDataFrame([(float(v),) for v in values], "x double").coalesce(1)
    dfp = df1.repartition(parts)
    a = df1.agg(dsum(F.col("x"), "s")).first()["s"]
    b = dfp.agg(dsum(F.col("x"), "s")).first()["s"]
    assert a == b  # bit-identical, not approx


@given(
    texts=st.lists(
        st.text(alphabet=" abcdefg", min_size=0, max_size=60), min_size=1, max_size=5
    )
)
@_slow
def test_shingles3_matches_python_reference(spark, texts):
    """The zip_with shingle construction (functions/text.py) must equal the
    obvious Python formulation for arbitrary whitespace-y strings —
    including degenerate cases (empty, all-spaces, <3 tokens)."""
    from pyspark.sql import functions as F

    from spark_cherry_shuffle_service_spark.functions.text import shingles3

    def py_shingles(text: str) -> list[str]:
        t = [w for w in text.strip().split(" ") if w != ""] if text.strip() else [text.strip()]
        # mirror split(trim, ' +'): empty string yields ['']
        if text.strip() == "":
            t = [""]
        raw = [" ".join(t[i : i + 3]) for i in range(len(t) - 2)]
        seen, out = set(), []
        for s in raw:
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out if len(t) >= 3 else []

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {r["id"]: list(r["sh"]) for r in df.select("id", shingles3(F.col("text")).alias("sh")).collect()}
    want = {i: py_shingles(t) for i, t in enumerate(texts)}
    assert got == want


@given(
    keys=st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=300),
    salt=st.sampled_from([2, 7, 16]),
)
@_slow
def test_salted_group_count_equivalence(spark, keys, salt):
    pairs = spark.createDataFrame([(k,) for k in keys], "key long")
    plain = {r["key"]: r["n"] for r in group_count(pairs).collect()}
    salted = {r["key"]: r["n"] for r in salted_group_count(pairs, salt=salt).collect()}
    assert salted == plain


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=32,
    )
)
@_slow
def test_zorder_interleave_roundtrips(spark, pts):
    """Morton key property: deinterleaving the engine's z-value recovers
    exactly the input bucket pair for arbitrary 8-bit coordinates."""
    from spark_cherry_shuffle_service_spark.operators.layout import zorder_value

    def deinterleave(z):
        x = y = 0
        for i in range(8):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        return x, y

    df = spark.createDataFrame(pts, "xb long, yb long").withColumn(
        "z", zorder_value(F.col("xb"), F.col("yb"))
    )
    for r in df.collect():
        assert deinterleave(r["z"]) == (r["xb"], r["yb"])
