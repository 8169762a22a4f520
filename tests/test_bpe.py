"""BPE rewrite-fold semantics: the JVM F.aggregate fold in
operators/bpe.py::merge_pair must implement exactly the left-to-right
non-overlapping replacement the Python oracle uses — hypothesis drives
random symbol arrays and merge pairs through both."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from spark_cherry_shuffle_service_spark.operators.bpe import merge_pair

_slow = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_SYM = st.sampled_from(["a", "b", "ab", "ba", "c"])


def _py_merge(syms: list[str], left: str, right: str) -> list[str]:
    out: list[str] = []
    pend: str | None = None
    for s in syms:
        if pend is None:
            pend = s
        elif pend == left and s == right:
            out.append(left + right)
            pend = None
        else:
            out.append(pend)
            pend = s
    if pend is not None:
        out.append(pend)
    return out


@given(
    arrays=st.lists(st.lists(_SYM, min_size=0, max_size=8), min_size=1, max_size=12),
    left=_SYM,
    right=_SYM,
)
@_slow
def test_merge_fold_matches_python(spark, arrays, left, right):
    df = spark.createDataFrame([(a,) for a in arrays], "syms array<string>")
    got = [list(r.m) for r in df.select(merge_pair(F.col("syms"), left, right).alias("m")).collect()]
    want = [_py_merge(a, left, right) for a in arrays]
    assert got == want


def test_merge_fold_overlap_is_left_to_right(spark):
    # "aaa" + (a,a) -> [aa, a], never [a, aa]; "aaaa" -> [aa, aa].
    df = spark.createDataFrame([(["a"] * 3,), (["a"] * 4,)], "syms array<string>")
    got = [list(r.m) for r in df.select(merge_pair(F.col("syms"), "a", "a").alias("m")).collect()]
    assert got == [["aa", "a"], ["aa", "aa"]]
