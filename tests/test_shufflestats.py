"""Measured shuffle accounting (plans/shufflestats.py): SCALE.md's
shuffle-inventory claims, checked against Spark's own stage metrics
instead of prose. Runs in a subprocess because the REST status API needs
a UI-enabled SparkContext and the shared test fixture's is UI-disabled
(one context per JVM)."""

from __future__ import annotations

import json
import subprocess
import sys

from tests.conftest import SF_SMOKE

_QUERIES = "pricing_summary,corpus_stratified_sample,dedup_exact,join_inner"


def test_shufflestats_measures_the_claimed_inventory(tmp_path):
    out = tmp_path / "stats.json"
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "spark_cherry_shuffle_service_spark",
            "--sf-dir",
            SF_SMOKE,
            "shufflestats",
            "--queries",
            _QUERIES,
            "--out",
            str(out),
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(out.read_text())

    # SCALE.md: "exact dedup = one shuffle on md5 fingerprint"
    dedup = stats["dedup_exact"]
    assert dedup["plan_shuffle_exchanges"] == 1
    assert dedup["shuffleWriteBytes"] > 0
    # shuffle conservation: what one side writes the other side reads
    assert dedup["shuffleReadBytes"] == dedup["shuffleWriteBytes"]

    # datapipe: stratified sampling is a pure per-row predicate — ZERO
    # shuffle, measured (not just plan-asserted in test_plans.py)
    strat = stats["corpus_stratified_sample"]
    assert strat["plan_shuffle_exchanges"] == 0
    assert strat["shuffleWriteBytes"] == 0
    assert strat["inputBytes"] > 0  # it did scan the table

    # relational spine: one agg-grain shuffle; dims broadcast
    ji = stats["join_inner"]
    assert ji["plan_shuffle_exchanges"] >= 1
    assert ji["plan_broadcast_exchanges"] >= 1

    summary = stats["_summary"]
    assert summary["zero_shuffle_queries"] == ["corpus_stratified_sample"]
    assert summary["cache_served_queries"] == []  # fresh session, 4 queries
    assert summary["n_queries"] == 4


def test_committed_shuffle_stats_artifact_is_coherent():
    """The committed sf0.1 artifact must cover the headline set and obey
    the structural invariants: a query classified zero-shuffle has no
    shuffle exchange in its plan; a cache-served query DOES (its bytes
    were paid by an earlier query's persist — the look-ahead-cache
    effect, which the artifact must not misreport as shuffle-free)."""
    import os

    import pytest

    from bench import HEADLINE

    path = "/root/repo/SHUFFLE_STATS.json"
    if not os.path.exists(path):
        pytest.skip("SHUFFLE_STATS.json not yet generated")
    stats = json.loads(open(path).read())
    rows = {k: v for k, v in stats.items() if not k.startswith("_")}
    assert set(rows) == set(HEADLINE)
    s = stats["_summary"]
    for n in s["zero_shuffle_queries"]:
        assert rows[n]["plan_shuffle_exchanges"] == 0, n
        assert rows[n]["shuffleWriteBytes"] == 0, n
    for n in s["cache_served_queries"]:
        assert rows[n]["plan_shuffle_exchanges"] > 0, n
        assert rows[n]["shuffleWriteBytes"] == 0, n
    # the documented zero-shuffle stratified-sampling claim, at sf0.1
    assert rows["corpus_stratified_sample"]["plan_shuffle_exchanges"] == 0
    # iterative graph ops are the top shufflers by design (per-round
    # exchange) — if they stop leading, the artifact is probably stale
    assert rows["graph_pagerank"]["shuffleWriteBytes"] > 0


def test_shuffle_bytes_scale_sublinearly_at_sf1():
    """Byte-scaling alarm over the committed sf0.1 and ~sf1 artifacts: a
    genuinely quadratic pair/candidate generator would shuffle ~100x the
    bytes at 10x fact data even where wall-clock noise hides it. Residual
    super-10x ratios have two understood causes on the v2 sqrt-entity
    fixtures: entity-pair densification (degree grows ~sqrt(10), pair
    operators ~degree^2 — graph_jaccard_ppm/common_neighbors ~21x) and
    DISTINCT-aggregate map-side-dedup saturation (partial dedup keeps
    min(partition_rows, domain) values per partition; rows x10 AND domain
    x3.16 means partitions stop saturating the domain — agg_distinct
    measured 65x from a 0.7 MB base). The alarm bounds every ratio at 80x
    (a true quadratic reads ~100x) and the median at 10x."""
    import os
    import statistics

    import pytest

    if not (
        os.path.exists("/root/repo/SHUFFLE_STATS.json")
        and os.path.exists("/root/repo/SHUFFLE_STATS_sf1.json")
    ):
        pytest.skip("shuffle-stats artifacts not yet generated")
    a = json.loads(open("/root/repo/SHUFFLE_STATS.json").read())
    b = json.loads(open("/root/repo/SHUFFLE_STATS_sf1.json").read())
    ratios = {}
    for k, ra in a.items():
        if k.startswith("_") or ra["shuffleWriteBytes"] < 100_000:
            continue  # sub-100KB bases are all fixed overhead
        ratios[k] = b[k]["shuffleWriteBytes"] / ra["shuffleWriteBytes"]
    assert len(ratios) > 40
    worst = max(ratios, key=ratios.get)
    assert ratios[worst] <= 80, (worst, ratios[worst])
    assert statistics.median(ratios.values()) <= 10


def test_committed_r7cont_shuffle_artifact_pins_bounded_claims():
    """The continuation-operator artifact (SHUFFLE_STATS_r7cont.json,
    sf0.1) must keep the measured scale claims honest: heavy hitters'
    total shuffle stays absolute-bounded (<10 MB — dominated by the
    fixture-only MG-input repartition; candidates/verify are KB-scale,
    never the 100k-key domain), BPE stays vocab-grain (< 5 MB), and the
    iterative graph ops lead the table via per-round exchanges."""
    import os

    import pytest

    path = "/root/repo/SHUFFLE_STATS_r7cont.json"
    if not os.path.exists(path):
        pytest.skip("SHUFFLE_STATS_r7cont.json not yet generated")
    stats = json.loads(open(path).read())
    rows = {k: v for k, v in stats.items() if not k.startswith("_")}
    for n in ("heavy_hitters_mg", "heavy_hitters_weighted"):
        assert rows[n]["shuffleWriteBytes"] < 10_000_000, (n, rows[n])
    for n in ("text_bpe_train", "text_bpe_apply"):
        assert rows[n]["shuffleWriteBytes"] < 5_000_000, (n, rows[n])
    top = max(rows, key=lambda n: rows[n]["shuffleWriteBytes"])
    assert top in {"graph_label_propagation", "graph_sssp_bounded", "graph_kcore"}, top


def test_committed_tpcds_shuffle_artifacts_pin_scale_claims():
    """Round-9 (VERDICT r8 item 8): the verbatim TPC-DS surface gets the
    same measured-shuffle evidence as the fixture queries.

    SHUFFLE_STATS_tpcds.json (all 122 texts, sf0.1 star) invariants:
    - full coverage, and every query's bytes are accounted (no negative /
      missing fields);
    - q67 (8-column ROLLUP over the year-2000 store slice — the 9x
      grouping-set expansion) leads the table, absolute-bounded < 60 MB;
    - q72, the reference's notorious join, shuffles < 1 MB at sf0.1: its
      nine dims broadcast (>= 8 broadcast exchanges in-plan) so the
      item-grain inventory fan-out stays map-side — the structural answer
      to the q72 blowup class;
    - the whole 122-query sweep stays < 250 MB total shuffle write
      (the 41-query round-9 slice measured ~100 MB; tripling the query
      count lands at ~190 MB because the added texts re-rank the same
      pre-aggregated grains).

    SHUFFLE_STATS_tpcds_sf1.json (round 11 widens the sf1 scale points
    from 7 to 17 — VERDICT r10 item 4): the headline pair q2+q5 PLUS the
    fifteen largest-shuffle verbatim queries by sf0.1 mass (q67 q67a
    q14a[_v27] q23a/b q22[_v27] q95 q47[_v27] q51[a] q24a/b).
    q2/q5 stay SUB-LINEAR (< 10x bytes at 10x facts: their week/rollup
    grains saturate). The heavy queries are rank-over-fine-grain
    rollups whose grain (item x store x month combos) is NOT saturated
    at these SFs, so their shuffle bytes grow ~linearly with the facts —
    measured 8.5x-13.8x at 10x data; the q47/q57 window family sits
    highest (13.8x) because its partially-saturated monthly grain at
    sf0.1 still compresses partial aggregates that sf1 cannot. The
    pinned invariant is NO SUPER-LINEAR BLOWUP (< 1.5x the data ratio;
    a q72-class fan-out would read ~100x) plus an absolute per-query
    byte ceiling at sf1."""
    import os

    import pytest

    p01 = "/root/repo/SHUFFLE_STATS_tpcds.json"
    p1 = "/root/repo/SHUFFLE_STATS_tpcds_sf1.json"
    if not (os.path.exists(p01) and os.path.exists(p1)):
        pytest.skip("TPC-DS shuffle artifacts not yet generated")
    from spark_cherry_shuffle_service_spark.operators.tpcds import SPARK_COLS

    stats = json.loads(open(p01).read())
    rows = {k: v for k, v in stats.items() if not k.startswith("_")}
    assert set(rows) == {f"sql_text_tpcds_{q}" for q in SPARK_COLS}
    assert all(r["shuffleWriteBytes"] >= 0 and r["stages"] > 0 for r in rows.values())
    top = max(rows, key=lambda n: rows[n]["shuffleWriteBytes"])
    assert top == "sql_text_tpcds_q67", top
    assert rows[top]["shuffleWriteBytes"] < 60_000_000
    q72 = rows["sql_text_tpcds_q72"]
    assert q72["shuffleWriteBytes"] < 1_000_000, q72
    assert q72["plan_broadcast_exchanges"] >= 8, q72
    assert sum(r["shuffleWriteBytes"] for r in rows.values()) < 250_000_000

    sf1 = json.loads(open(p1).read())
    sf1_rows = {k: v for k, v in sf1.items() if not k.startswith("_")}
    assert len(sf1_rows) >= 15, sorted(sf1_rows)
    for q in ("sql_text_tpcds_q2", "sql_text_tpcds_q5"):
        base = rows[q]["shuffleWriteBytes"]
        scaled = sf1[q]["shuffleWriteBytes"]
        assert base > 0 and scaled > 0
        assert scaled < 10 * base, (q, base, scaled)
    # The fifteen heaviest shufflers: ~linear growth, never super-linear
    # (measured at commit time: 8.5x-13.8x for 10x facts), plus absolute
    # sf1 ceilings so a regression is visible even if sf0.1 drifts too.
    heavy_caps = {
        "sql_text_tpcds_q67": 300_000_000,
        "sql_text_tpcds_q67a": 280_000_000,
        "sql_text_tpcds_q14a": 200_000_000,
        "sql_text_tpcds_q14a_v27": 200_000_000,
        "sql_text_tpcds_q23a": 180_000_000,
        "sql_text_tpcds_q23b": 200_000_000,
        "sql_text_tpcds_q22": 130_000_000,
        "sql_text_tpcds_q22_v27": 130_000_000,
        "sql_text_tpcds_q95": 120_000_000,
        "sql_text_tpcds_q47": 150_000_000,
        "sql_text_tpcds_q47_v27": 150_000_000,
        "sql_text_tpcds_q51": 90_000_000,
        "sql_text_tpcds_q51a": 90_000_000,
        "sql_text_tpcds_q24a": 70_000_000,
        "sql_text_tpcds_q24b": 70_000_000,
    }
    for q, cap in heavy_caps.items():
        base = rows[q]["shuffleWriteBytes"]
        scaled = sf1[q]["shuffleWriteBytes"]
        assert base > 0 and scaled > 0, q
        assert scaled < 15 * base, (q, base, scaled)  # 1.5x the 10x data ratio
        assert scaled < cap, (q, scaled)


def test_committed_sf5_shuffle_artifact_pins_two_decade_scaling():
    """Round-11 continuation: the shuffle-byte ledger's third scale point
    (sf0.1 → ~sf1 → ~sf5, a 50x fact-growth span). Invariants:

    - every sf1 ledger query has an sf5 row, and every heavy shuffler
      grows SUB-1.5x-LINEAR in bytes across the 5x step (measured
      2.4x–6.3x; a q72-class fan-out would read ~25x+), under an
      absolute per-query cap;
    - q2 stays saturated (its week-grain aggregate domain is fixed —
      1.36x measured);
    - q5 carries the ledger's one STRUCTURAL plan shift, asserted
      deliberately: at ~sf5 web_sales crosses the broadcast threshold
      and its web_returns ⋈ web_sales (item, order_number) fact-fact
      join flips BHJ → SortMergeJoin (plan re-verified: 0 SMJ at sf1,
      1 SMJ at sf5), so shuffle bytes jump from ~0.1 MB (all-broadcast)
      to one fact exchange — the CORRECT production plan at scale, kept
      under an absolute cap rather than a ratio (a ratio over a
      saturated 0.1 MB base is meaningless)."""
    import os

    import pytest

    p1 = "/root/repo/SHUFFLE_STATS_tpcds_sf1.json"
    p5 = "/root/repo/SHUFFLE_STATS_tpcds_sf5.json"
    if not (os.path.exists(p1) and os.path.exists(p5)):
        pytest.skip("sf1/sf5 TPC-DS shuffle artifacts not yet generated")
    sf1 = json.loads(open(p1).read())
    sf5 = json.loads(open(p5).read())
    rows1 = {k: v for k, v in sf1.items() if not k.startswith("_")}
    rows5 = {k: v for k, v in sf5.items() if not k.startswith("_")}
    assert set(rows1) <= set(rows5), sorted(set(rows1) - set(rows5))

    special = {"sql_text_tpcds_q2", "sql_text_tpcds_q5"}
    for q in sorted(set(rows1) - special):
        base = rows1[q]["shuffleWriteBytes"]
        scaled = rows5[q]["shuffleWriteBytes"]
        assert base > 0 and scaled > 0, q
        assert scaled < 7.5 * base, (q, base, scaled)  # 1.5x the 5x ratio
        assert scaled < 1_200_000_000, (q, scaled)  # q67 leads at ~1.07 GB
    # q2: saturated week grain.
    assert rows5["sql_text_tpcds_q2"]["shuffleWriteBytes"] < 10 * rows1[
        "sql_text_tpcds_q2"
    ]["shuffleWriteBytes"]
    # q5: the documented BHJ -> SMJ flip; one fact exchange, absolutely
    # bounded, and visibly a plan change (exchange counts shifted).
    q5_1, q5_5 = rows1["sql_text_tpcds_q5"], rows5["sql_text_tpcds_q5"]
    assert q5_5["shuffleWriteBytes"] < 250_000_000, q5_5
    assert q5_5["plan_shuffle_exchanges"] > q5_1["plan_shuffle_exchanges"]
    assert q5_5["plan_broadcast_exchanges"] < q5_1["plan_broadcast_exchanges"]
