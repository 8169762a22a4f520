"""Misra–Gries heavy hitters: the two invariants the operator's oracle
check can't see on its own.

1. RECALL GUARANTEE — the pure-Python summary merge retains every key with
   global count > n/(capacity+1), for arbitrary streams and batch splits
   (Mergeable-Summaries bound). Hypothesis drives skewed streams through
   the batch-merge path directly (no Spark job per example).
2. PARTITION INVARIANCE — the full two-pass operator returns identical
   rows at 1, 3, and 32 partitions even though the intermediate candidate
   set differs per partitioning (the exact verify pass is what makes the
   operator safe to grade against a plain GROUP BY oracle).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from spark_cherry_shuffle_service_spark.operators.sketches import (
    _mg_merge,
    heavy_hitters_exact,
    misra_gries_candidates,
)

_fast = settings(max_examples=200, deadline=None)
_slow = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _fold_stream(stream: list[int], capacity: int, batch: int) -> dict[int, int]:
    counters: dict[int, int] = {}
    for i in range(0, len(stream), batch):
        counters = _mg_merge(
            counters, pd.Series(stream[i : i + batch]).value_counts(), capacity
        )
    return counters


@given(
    # Skewed stream: a few hot keys repeated + a long unique tail.
    hot=st.lists(st.tuples(st.integers(0, 5), st.integers(1, 60)), min_size=0, max_size=4),
    tail=st.integers(0, 300),
    capacity=st.integers(1, 12),
    batch=st.integers(1, 37),
)
@_fast
def test_mg_merge_recall_guarantee(hot, tail, capacity, batch):
    stream: list[int] = []
    for key, reps in hot:
        stream += [key] * reps
    stream += list(range(1000, 1000 + tail))  # unique tail keys
    if not stream:
        return
    n = len(stream)
    exact: dict[int, int] = {}
    for k in stream:
        exact[k] = exact.get(k, 0) + 1
    counters = _fold_stream(stream, capacity, batch)
    assert len(counters) <= capacity
    heavy = {k for k, c in exact.items() if c * (capacity + 1) > n}
    missing = heavy - set(counters)
    assert not missing, f"lost heavy keys {missing}: n={n} capacity={capacity}"
    # Undercount bound: estimate >= true - n/(capacity+1).
    for k, est in counters.items():
        assert est <= exact[k]
        assert (exact[k] - est) * (capacity + 1) <= n


@given(parts=st.sampled_from([1, 3, 32]))
@_slow
def test_heavy_hitters_partition_invariant(spark, parts):
    rows = [(i % 7,) for i in range(400)] + [(100 + i,) for i in range(300)]
    df = spark.createDataFrame(rows, "key long").repartition(parts)
    got = sorted((r.key, r.cnt) for r in heavy_hitters_exact(df, k=20, capacity=25).collect())
    # keys 0..6 hold ~57 rows each of 700 total (8.2% > 5%); tail keys 1 row.
    assert got == [(i, 58 if i == 0 else 57) for i in range(7)]


def test_candidates_bounded_and_superset(spark):
    df = spark.createDataFrame(
        [(1, 1)] * 50 + [(i, 1) for i in range(200, 400)], "key long, w long"
    ).repartition(4)
    cands = {r.key for r in misra_gries_candidates(df, capacity=10).collect()}
    assert 1 in cands  # 50/250 = 20% >> 1/11
    # Each partition emits at most `capacity` keys.
    assert len(cands) <= 4 * 10


def test_weighted_heavy_hitters_match_unit_weight_semantics(spark):
    """weight='w' with all-ones weights must equal the unweighted path,
    and a key that is rare by COUNT but heavy by MASS must be found."""
    rows = [(i % 7, 1) for i in range(400)] + [(100 + i, 1) for i in range(300)]
    df = spark.createDataFrame(rows, "key long, w long")
    a = sorted(map(tuple, heavy_hitters_exact(df, k=20, capacity=25).collect()))
    b = sorted(
        map(tuple, heavy_hitters_exact(df, k=20, capacity=25, weight="w").collect())
    )
    assert a == b
    # key 999 appears ONCE but carries half the total mass.
    heavy_mass = [(i, 1) for i in range(1000)] + [(999, 1000)]
    dfm = spark.createDataFrame(heavy_mass, "key long, w long").repartition(4)
    got = {r.key for r in heavy_hitters_exact(dfm, k=3, capacity=16, weight="w").collect()}
    assert got == {999}


def test_capacity_below_k_rejected(spark):
    df = spark.createDataFrame([(1,)], "key long")
    with pytest.raises(ValueError):
        heavy_hitters_exact(df, k=50, capacity=10)
