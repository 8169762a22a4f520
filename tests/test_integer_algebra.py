"""Hypothesis property tests for the round-5 integer/decimal algebra
kernels — pure Python (no Spark jobs), so hundreds of examples are cheap.

These pin the MATHEMATICAL identities the operators rely on; the DuckDB
differential pins the cross-engine implementation of the same algebra.
"""

from __future__ import annotations

from decimal import Decimal
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

_ints = st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=200)


@given(_ints)
@settings(max_examples=300, deadline=None)
def test_cusum_closed_form_equals_recurrence(xs):
    """S_i = P_i - min(0, min_{j<=i} P_j) == max(0, S_{i-1} + x_i)
    (events_cusum / cusum_stream kernel)."""
    s = 0
    p = 0
    minp = 0
    for x in xs:
        s = max(0, s + x)
        p += x
        minp = min(minp, p)
        assert s == p - min(minp, 0)


@given(_ints.filter(lambda xs: len(xs) >= 2))
@settings(max_examples=300, deadline=None)
def test_integer_zscore_inequality_equals_exact_zscore(xs):
    """(n*x - S)^2 > 9*(n*Q - S^2)  <=>  (x-mu)^2 > 9*sigma^2 computed in
    exact rationals (events_rolling_zscore kernel, population variance)."""
    n = len(xs)
    s = sum(xs)
    q = sum(x * x for x in xs)
    mu = Fraction(s, n)
    var = Fraction(q, n) - mu * mu
    for x in xs:
        left = (n * x - s) ** 2 > 9 * (n * q - s * s)
        right = (Fraction(x) - mu) ** 2 > 9 * var
        assert left == right, (x, xs)


@given(_ints, st.integers(min_value=-10**6, max_value=10**6))
@settings(max_examples=300, deadline=None)
def test_changepoint_deviation_is_level_shift_invariant(xs, c):
    """D_i = |n*P_i - i*P_n| is unchanged by adding a constant to every
    point — the reason events_changepoint detects shape, not level."""
    n = len(xs)

    def devs(series):
        p = 0
        total = sum(series)
        out = []
        for i, x in enumerate(series, start=1):
            p += x
            out.append(abs(n * p - i * total))
        return out

    assert devs(xs) == devs([x + c for x in xs])


@given(st.integers(min_value=-10**9, max_value=10**9), st.integers(min_value=1, max_value=10**6))
@settings(max_examples=300, deadline=None)
def test_sign_split_floor_division_matches_rounding_toward_zero(s, d):
    """SIGN(S) * (|S|*k // d) (the tau_ppm form) equals exact-rational
    truncation toward zero — and is engine-agnostic because the division
    operand is always non-negative (events_trend_mannkendall kernel)."""
    k = 1_000_000
    got = (1 if s >= 0 else -1) * ((abs(s) * k) // d)
    exact = Fraction(s * k, d)
    trunc = int(exact)  # int() truncates toward zero
    assert got == trunc


@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_floor_div_shares_sum_within_key_count(ns):
    """Basis-point shares by floor division under-count by < 1 bp per key
    (the drift/seasonality/benford share convention)."""
    total = sum(ns)
    if total == 0:
        return
    shares = [n * 10000 // total for n in ns]
    assert 10000 - len(ns) < sum(shares) <= 10000


@given(_ints)
@settings(max_examples=200, deadline=None)
def test_decimal_micro_units_roundtrip(xs):
    """BIGINT micro-units <-> DECIMAL(18,6) is lossless for 6-dp values
    (the peak_cusum_micros / TWAP / pagerank fixed-point convention)."""
    for x in xs:
        d = Decimal(x) / Decimal(1_000_000)
        assert int(d * 1_000_000) == x


@given(
    st.integers(min_value=0, max_value=5000),
    st.integers(min_value=1, max_value=50),
)
@settings(max_examples=300, deadline=None)
def test_ntile_formula_matches_sql_standard(n, k):
    """functions/ranking.py::ntile_expr's arithmetic — with q = n DIV k,
    r = n % k, the first r tiles hold q+1 rows — must reproduce the SQL
    NTILE bucket for every rank 1..n (the identity the distributed
    ranking decomposition relies on to replace global NTILE windows)."""
    q, r = divmod(n, k)
    cut = r * (q + 1)

    def formula(rank: int) -> int:
        if rank <= cut:
            return (rank - 1) // (q + 1) + 1
        return r + (rank - cut - 1) // q + 1

    # Reference NTILE: distribute n rows into k ordered buckets whose
    # sizes differ by at most one, larger buckets first.
    sizes = [q + 1] * r + [q] * (k - r)
    expect = []
    for tile, size in enumerate(sizes, start=1):
        expect.extend([tile] * size)
    assert [formula(i) for i in range(1, n + 1)] == expect
