"""Property tests for the SPC/observability suite (operators/monitoring.py).

The DuckDB differential (test_oracle_parity) already pins cross-engine
equality; these pin the MATH — notably that the windowed closed form
S_i = P_i - min(0, min P_j) really is the max(0, S+dev) CUSUM recurrence.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from spark_cherry_shuffle_service_spark.plans.registry import all_specs
from spark_cherry_shuffle_service_spark.sources.catalog import table
from tests.conftest import SF_SMOKE

SPECS = all_specs()


def test_cusum_closed_form_equals_recurrence(spark):
    """Replay the textbook recurrence in exact Decimal on the driver for
    every event type and demand identical alarm counts and peak."""
    got = {
        r["event_type"]: r
        for r in SPECS["events_cusum"].builder(spark, SF_SMOKE).collect()
    }

    ev = table(spark, SF_SMOKE, "events")
    mu_rows = (
        ev.groupBy("event_type")
        .agg((F.sum(F.round("value", 6).cast("decimal(18,6)")).cast("double") / F.count("value")).alias("mu_d"))
        .collect()
    )
    # HALF_UP on the shortest-decimal repr — the money()/F.round twin;
    # Python round() is half-even on the binary value and can diverge on
    # a .5-boundary (ADVICE r5).
    def q6(x: float) -> Decimal:
        return Decimal(repr(float(x))).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)

    mus = {r["event_type"]: q6(r["mu_d"]) for r in mu_rows}

    rows = (
        ev.select("event_type", "ts", "event_id", "value")
        .orderBy("event_type", "ts", "event_id")
        .collect()
    )
    state: dict[str, Decimal] = {}
    alarms: dict[str, int] = {}
    peak: dict[str, Decimal] = {}
    h = Decimal("500.000000")
    for r in rows:
        t = r["event_type"]
        dev = q6(r["value"]) - mus[t]
        s = max(Decimal(0), state.get(t, Decimal(0)) + dev)
        state[t] = s
        if s > h:
            alarms[t] = alarms.get(t, 0) + 1
        peak[t] = max(peak.get(t, Decimal(0)), s)

    for t, row in got.items():
        assert row["n_alarms"] == alarms.get(t, 0), t
        assert row["peak_cusum_micros"] == int(peak[t] * 1_000_000), t


def test_benford_shares_are_complete_and_bounded(spark):
    rows = SPECS["dq_benford"].builder(spark, SF_SMOKE).collect()
    assert [r["leading_digit"] for r in rows] == list(range(1, 10))
    total_bp = sum(r["observed_bp"] for r in rows)
    # floor-division shares: sum in (10000-9, 10000]
    assert 9991 <= total_bp <= 10000
    assert sum(r["expected_bp"] for r in rows) == 10000
    for r in rows:
        assert r["dev_bp"] == abs(r["observed_bp"] - r["expected_bp"])


def test_distribution_drift_tv_identity(spark):
    rows = SPECS["dq_distribution_drift"].builder(spark, SF_SMOKE).collect()
    for col in ("share_a_bp", "share_b_bp"):
        s = sum(r[col] for r in rows)
        assert 10000 - len(rows) < s <= 10000, col
    for r in rows:
        assert r["drift_bp"] == abs(r["share_a_bp"] - r["share_b_bp"])


def test_bfs_frontiers_are_disjoint_and_seeded(spark, duck_smoke):
    rows = {r["hop"]: r["n_nodes"] for r in SPECS["graph_bfs_levels"].builder(spark, SF_SMOKE).collect()}
    n_seeds = duck_smoke.execute(
        "SELECT COUNT(DISTINCT s_suppkey) FROM supplier WHERE s_nationkey = 0"
    ).fetchone()[0]
    assert rows[0] == n_seeds
    # Levels are counts of NEWLY reached nodes; total reach is bounded by
    # the bipartite node universe.
    universe = duck_smoke.execute(
        "SELECT (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem)"
        " + (SELECT COUNT(DISTINCT o_custkey) FROM orders)"
    ).fetchone()[0]
    assert sum(rows.values()) <= universe + n_seeds


def test_backlog_aging_counts_only_open_orders(spark, duck_smoke):
    rows = SPECS["orders_backlog_aging"].builder(spark, SF_SMOKE).collect()
    n_open = duck_smoke.execute(
        "SELECT COUNT(*) FROM orders WHERE o_orderstatus IN ('O','P')"
    ).fetchone()[0]
    assert sum(r["n_orders"] for r in rows) == n_open


def test_cross_source_leakage_is_symmetric_bounded(spark):
    df = SPECS["corpus_cross_source_leakage"].builder(spark, SF_SMOKE)
    rows = df.collect()
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert r["n_shared_ngrams"] >= 1
    # at most one row per unordered source pair
    assert len({(r["source_a"], r["source_b"]) for r in rows}) == len(rows)


def test_mannkendall_statistic_is_bounded(spark):
    rows = SPECS["events_trend_mannkendall"].builder(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        pairs = r["n_days"] * (r["n_days"] - 1) // 2
        assert abs(r["s_stat"]) <= pairs
        assert abs(r["tau_ppm"]) <= 1_000_000
        # sign-split floor division: tau sign tracks S sign (0 -> non-negative)
        if r["s_stat"] > 0:
            assert r["tau_ppm"] >= 0
        elif r["s_stat"] < 0:
            assert r["tau_ppm"] <= 0


def test_changepoint_split_in_range(spark):
    rows = SPECS["events_changepoint"].builder(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["split_index"] <= r["n_events"]
        assert r["max_dev"] >= 0


def test_truncation_fidelity_bounds(spark):
    rows = SPECS["embedding_truncation_fidelity"].builder(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["overlap_at_10"] <= 10
        assert r["footrule_at_10"] >= 0


def test_stickiness_is_a_proper_ratio(spark):
    rows = SPECS["events_stickiness"].builder(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # avg DAU can't exceed MAU: stickiness in (0, 10000]
        assert 0 < r["stickiness_bp"] <= 10000
        assert r["sum_dau"] <= r["n_days"] * r["mau"]


def test_vocab_growth_is_monotone(spark):
    rows = SPECS["corpus_vocab_growth"].builder(spark, SF_SMOKE).collect()
    caps = [r["cap"] for r in rows]
    assert caps == sorted(caps)
    vocab = [r["vocab_size"] for r in rows]
    ndocs = [r["n_docs"] for r in rows]
    assert vocab == sorted(vocab) and ndocs == sorted(ndocs)


def test_rolling_zscore_alarm_rate_is_sane(spark):
    rows = SPECS["events_rolling_zscore"].builder(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # |z|>3 on ~uniform data: alarms must be a small minority
        assert 0 <= r["n_alarms"] < r["n_events"] * 0.2
