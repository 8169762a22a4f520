"""Driver-contract pre-flight (VERDICT r2 item #2).

Round 2 shipped a bench that crashed at query 12/75 because nothing built
the HEADLINE queries at test time. These tests BUILD (not execute) every
HEADLINE DataFrame plus every registered query, so a plan-level crash in
any driver-facing contract fails pytest at commit time instead of the
grading run.
"""

from __future__ import annotations

from bench import HEADLINE
from spark_cherry_shuffle_service_spark.plans.registry import all_specs
from tests.conftest import SF_SMOKE


def test_every_headline_query_builds(spark):
    """Every bench.py HEADLINE entry must resolve in the registry and build
    to a DataFrame with a non-empty schema (analysis runs; no execution)."""
    specs = all_specs()
    missing = [n for n in HEADLINE if n not in specs]
    assert not missing, f"HEADLINE names absent from registry: {missing}"
    failed: dict[str, str] = {}
    for name in HEADLINE:
        try:
            df = specs[name].builder(spark, SF_SMOKE)
            assert len(df.schema.fields) > 0
        except Exception as exc:  # noqa: BLE001 — report all, not first
            failed[name] = f"{type(exc).__name__}: {exc}"[:200]
    assert not failed, f"{len(failed)} HEADLINE queries fail to build: {failed}"


def test_headline_has_no_duplicates():
    assert len(HEADLINE) == len(set(HEADLINE))


def test_entry_module_contract(spark):
    """__spark_entry__ must expose entry/queries/oracle_sql with matching
    keys, and entry() must build against the smoke fixture."""
    import __spark_entry__ as mod

    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle_sql keys must be a subset of queries"
    df = mod.entry(spark)
    assert len(df.schema.fields) > 0


def test_median_helper():
    from bench import _median

    assert _median([3.0]) == 3.0
    assert _median([5.0, 1.0, 2.0]) == 2.0
    assert _median([4.0, 1.0]) == 2.5


def test_baseline_queries_file_matches_headline():
    """BASELINE_QUERIES.json (the canonical per-query table bench.py uses
    for its in-run stall re-time) must cover exactly the HEADLINE set with
    positive timings."""
    import json

    with open("/root/repo/BASELINE_QUERIES.json") as fh:
        base = json.load(fh)["queries"]
    assert set(base) == set(HEADLINE), (
        f"baseline/HEADLINE drift: only-baseline={set(base) - set(HEADLINE)}, "
        f"only-headline={set(HEADLINE) - set(base)} — re-run `python bench.py` "
        "and refresh BASELINE_QUERIES.json after changing HEADLINE"
    )
    assert all(v > 0 for v in base.values())


def test_calibration_normalized_gate_absorbs_uniform_slowdown():
    """VERDICT r7 item 2: a uniformly 1.5x-slowed host window (every query
    1.5x its baseline AND the code-independent calibration probe 1.5x its
    baseline-epoch value) must yield ZERO violations under the normalized
    gate — BENCH_r07 carried 4 phantom violations from exactly this class.
    A real regression (one query 3x while the window is clean) must still
    flag, and a faster window must never relax the gate below raw."""
    import json

    from bench import drift_factor, is_violation

    with open("/root/repo/BASELINE_QUERIES.json") as fh:
        doc = json.load(fh)
    baselines = {k: float(v) for k, v in doc["queries"].items()}
    cal_base = float(doc["calibration_sec"])  # the gate requires the epoch probe

    # Uniformly slowed window: zero violations.
    drift = drift_factor(1.5 * cal_base, cal_base)
    assert abs(drift - 1.5) < 1e-9
    slowed = {n: 1.5 * b for n, b in baselines.items()}
    assert not any(is_violation(t, baselines[n], drift) for n, t in slowed.items())
    # The real counterfactual (ADVICE r8: the previous form carried a
    # constant-false `1.5 > 2.0` that made the check vacuous): a 1.5x table
    # never flags even UN-normalized (2x factor alone absorbs it), while a
    # 2.5x table at drift 1.0 does flag — that's the phantom class the
    # normalization exists for, exercised below.
    assert not any(is_violation(1.5 * b, b, 1.0) for b in baselines.values())
    worse = {n: 2.5 * b for n, b in baselines.items() if b > 1.0}
    assert any(is_violation(t, baselines[n], 1.0) for n, t in worse.items())
    assert not any(is_violation(t, baselines[n], 2.5) for n, t in worse.items())

    # A real regression still flags in a clean window (drift 1.0) and in a
    # mildly drifted one.
    name = max(baselines, key=baselines.get)
    assert is_violation(10 * baselines[name] + 1.0, baselines[name], 1.0)
    assert is_violation(10 * baselines[name] + 1.0, baselines[name], 1.2)

    # A faster window never tightens below the raw baseline.
    assert drift_factor(0.5 * cal_base, cal_base) == 1.0
    # Missing probe values degrade to the raw gate, never crash.
    assert drift_factor(None, cal_base) == 1.0
    assert drift_factor(1.0, None) == 1.0


def test_sf1_bench_artifact_scales_sublinearly():
    """BENCH_sf1.json (full headline bench on the generated ~sf1
    fixtures, 10x the sf0.1 fact tables) is the committed scaling
    evidence: every per-query ratio vs the sf0.1 baseline must stay
    under 10x — a query that costs 10x at 10x data has stopped being
    sub-linear, and an O(n^2) regression would read ~100x. Observed
    worst at commit time: 4.75x (agg_percentiles, the documented
    exact-unbounded query whose registry entry names its bounded
    scale_twin)."""
    import json
    import os

    import pytest

    path = "/root/repo/BENCH_sf1.json"
    if not os.path.exists(path):
        pytest.skip("BENCH_sf1.json not yet generated")
    with open(path) as fh:
        sf1 = json.load(fh)
    assert sf1["sf"] == 1.0
    with open("/root/repo/BASELINE_QUERIES.json") as fh:
        base = json.load(fh)["queries"]
    assert set(sf1["queries"]) == set(HEADLINE)
    bad = {
        k: round(sf1["queries"][k] / base[k], 2)
        for k in sf1["queries"]
        if k in base and sf1["queries"][k] > 10 * base[k]
    }
    assert not bad, f"super-linear scaling at 10x data: {bad}"


def test_baseline_file_selection_by_sf():
    """bench.py picks the baseline table by the fixture dir's SF tag
    (VERDICT r9 item 2): canonical sf0.1 -> BASELINE_QUERIES.json, sf1 ->
    BASELINE_QUERIES_sf1.json when committed, anything unbaselined ->
    None (zero baselines beats phantom violations)."""
    import os

    from bench import BASELINE_FILE, baseline_file_for

    assert baseline_file_for("/root/testdata/sf0.1") == BASELINE_FILE
    assert baseline_file_for("/root/testdata/sf0.1/") == BASELINE_FILE
    sf1 = baseline_file_for("/root/repo/.genscale/sf1")
    if os.path.exists("/root/repo/BASELINE_QUERIES_sf1.json"):
        assert sf1 == "/root/repo/BASELINE_QUERIES_sf1.json"
    else:
        assert sf1 is None
    assert baseline_file_for("/tmp/nonexistent/sf42") is None
    # ADVICE r10: a GENERATED sf0.1 shares the basename but not the data —
    # it must not inherit the canonical table (nor, in main(), refresh
    # COLD_BASELINE.json; the resolved-path check covers both call sites).
    assert baseline_file_for("/root/repo/.genscale/sf0.1") is None


def test_cold_baseline_covers_persist_heavy_set():
    """COLD_BASELINE.json (VERDICT r9 item 8): every persist-heavy query
    must carry a cold runs[0] entry, and the set itself must stay inside
    the headline protocol so bench.py can refresh it."""
    import json
    import os

    import pytest

    from bench import HEADLINE, PERSIST_HEAVY

    assert set(PERSIST_HEAVY) <= set(HEADLINE)
    path = "/root/repo/COLD_BASELINE.json"
    if not os.path.exists(path):
        pytest.skip("COLD_BASELINE.json not yet generated")
    with open(path) as fh:
        cold = json.load(fh)
    assert set(PERSIST_HEAVY) <= set(cold["queries"])
    assert all(v > 0 for v in cold["queries"].values())
    # ADVICE r10: the artifact must name the canonical fixture dir it was
    # measured on — a generated sf0.1 lookalike can never refresh it.
    from bench import CANONICAL_SF01

    assert cold["_sf_dir"] == CANONICAL_SF01
