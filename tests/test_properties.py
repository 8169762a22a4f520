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
    keys=st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=300),
    salt=st.sampled_from([2, 7, 16]),
)
@_slow
def test_salted_group_count_equivalence(spark, keys, salt):
    pairs = spark.createDataFrame([(k,) for k in keys], "key long")
    plain = {r["key"]: r["n"] for r in group_count(pairs).collect()}
    salted = {r["key"]: r["n"] for r in salted_group_count(pairs, salt=salt).collect()}
    assert salted == plain
