"""Generated-scale fixture tests (sources/genscale.py) — the determinism
path past sf0.1 (VERDICT r6 item 1).

Three claims, each checked:
1. The generator is deterministic: two runs produce identical tables.
2. Queries stay cross-engine bit-identical on GENERATED data (the slice
   where all four historical determinism bugs lived) — proven here at a
   small scale in-suite, and at ~sf1 by the committed COMPARE_sf1.json
   artifact (kept honest by test_committed_sf1_artifact_is_green).
3. The events_changepoint int64 guard FIRES before Spark's ANSI-off
   silent wrap — exercised with data past the documented bound, plus an
   integer-algebra proof that the bound covers the signed combination.
"""

from __future__ import annotations

import json
import os
import re

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_cherry_shuffle_service_spark.plans.differential import compare_queries
from spark_cherry_shuffle_service_spark.plans.registry import all_specs
from spark_cherry_shuffle_service_spark.sources.genscale import (
    BASE_ROWS,
    MEAN_LINES_PER_ORDER,
    gen_events,
    generate_scaled_fixtures,
    value_sensitive_names,
)

SLICE_SAMPLE = (
    "events_changepoint",
    "events_cusum",
    "events_rolling_zscore",
    "events_trend_mannkendall",
    "decimal_pricing",
    "orders_fulfillment_latency",
    "customer_revenue_deciles",
    "orders_rfm",
    "cdc_merge_apply",
    "events_twap",
)


@pytest.fixture(scope="module")
def gen_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("genscale") / "sf005")
    generate_scaled_fixtures(spark, out_dir=out, scale=0.05, partitions=8)
    return out


def test_manifest_and_shape(spark, gen_dir):
    with open(os.path.join(gen_dir, "_GENSCALE.json")) as fh:
        m = json.load(fh)
    assert m["row_counts"]["orders"] == int(BASE_ROWS["orders"] * 0.05)
    assert m["row_counts"]["events"] == int(BASE_ROWS["events"] * 0.05)
    # lineitem is 1..7 lines/order, mean 4 — allow 5% drift at 7.5k orders
    expect_li = m["row_counts"]["orders"] * MEAN_LINES_PER_ORDER
    assert abs(m["row_counts"]["lineitem"] - expect_li) / expect_li < 0.05
    # idempotent: a second call with a matching manifest is a no-op
    m2 = generate_scaled_fixtures(spark, out_dir=gen_dir, scale=0.05, partitions=8)
    assert m2["row_counts"] == m["row_counts"]


def test_generated_schema_matches_fixture_schema(spark, gen_dir):
    """The generated physical types must be drop-in for the driver's r2
    fixtures (timestamp[us] NTZ etc.) so every registered query reads them
    through the same catalog branches."""
    for t in ("orders", "lineitem", "events"):
        gen = dict(spark.read.parquet(f"{gen_dir}/{t}.parquet").dtypes)
        fix = dict(spark.read.parquet(f"/root/testdata/sf0.1/{t}.parquet").dtypes)
        assert gen == fix, f"{t}: {gen} != {fix}"


def test_generator_is_deterministic(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    generate_scaled_fixtures(spark, out_dir=a, scale=0.02, partitions=4)
    generate_scaled_fixtures(spark, out_dir=b, scale=0.02, partitions=4)
    con = duckdb.connect()
    for t in ("orders", "lineitem", "events"):
        for x, y in ((a, b), (b, a)):
            diff = con.execute(
                f"SELECT count(*) FROM (SELECT * FROM '{x}/{t}.parquet/*.parquet'"
                f" EXCEPT SELECT * FROM '{y}/{t}.parquet/*.parquet')"
            ).fetchone()[0]
            assert diff == 0, f"{t}: {diff} rows differ between identical runs"


def test_generated_slice_matches_oracle(spark, gen_dir):
    """Cross-engine differential on PURELY generated data: the ten most
    value-sensitive shapes (windowed micro-sums, DECIMAL money, deciles,
    CDC ROUND ties) hash-match DuckDB byte-for-byte."""
    results = compare_queries(spark, gen_dir, list(SLICE_SAMPLE))
    bad = {k: v for k, v in results.items() if v != "match"}
    assert not bad, f"generated-data mismatches: {bad}"


def test_value_sensitive_slice_resolves():
    names = value_sensitive_names()
    specs = all_specs()
    assert len(names) >= 40
    assert all(n in specs and specs[n].oracle for n in names)
    assert set(SLICE_SAMPLE) <= set(names)


def test_committed_sf1_artifact_is_green():
    """The committed ~sf1 differential artifact must be all-match and must
    cover the current slice — a stale or red COMPARE_sf1.json fails the
    gate instead of silently rotting."""
    path = "/root/repo/COMPARE_sf1.json"
    if not os.path.exists(path):
        pytest.skip("COMPARE_sf1.json not yet generated")
    with open(path) as fh:
        art = json.load(fh)
    verdicts = {k: v for k, v in art.items() if not k.startswith("_")}
    assert art["_failures"] == 0
    assert all(v.startswith("match") for v in verdicts.values())
    assert set(value_sensitive_names()) <= set(verdicts)


def test_committed_sf5_artifact_is_green():
    """The ~sf5 (50× sf0.1) value-sensitive slice artifact: every verdict
    green, the previously-excluded entity-pair queries PRESENT (genscale
    v2's sqrt-entity scaling keeps their DuckDB oracles feasible —
    VERDICT r7 item 3), and the only allowed _excluded entry is
    events_changepoint, whose int64 guard fires past ~sf2 BY DESIGN.
    Silent shrinkage fails."""
    path = "/root/repo/COMPARE_sf5.json"
    if not os.path.exists(path):
        pytest.skip("COMPARE_sf5.json not yet generated")
    with open(path) as fh:
        art = json.load(fh)
    verdicts = {k: v for k, v in art.items() if not k.startswith("_")}
    assert art["_failures"] == 0
    assert all(v.startswith("match") for v in verdicts.values())
    assert set(art["_excluded"]) <= {"events_changepoint"}
    assert {"er_blocked_linkage", "graph_common_neighbors", "graph_jaccard_ppm"} <= set(
        verdicts
    )
    expected = set(value_sensitive_names()) - set(art["_excluded"])
    assert expected <= set(verdicts)
    # Round 10 (VERDICT r9 item 6): the verbatim TPC-DS corpus is part of
    # the ~50x slice — the reference's headline pair, the hardest join,
    # and the rollup family must be present and green.
    assert {
        "sql_text_tpcds_q2", "sql_text_tpcds_q5", "sql_text_tpcds_q72",
        "sql_text_tpcds_q67", "sql_text_tpcds_q18", "sql_text_tpcds_q22",
        "sql_text_tpcds_q36", "sql_text_tpcds_q70", "sql_text_tpcds_q86",
        # the round-10 plant-driven pair: proves the v10 cohorts scale
        "sql_text_tpcds_q85", "sql_text_tpcds_q24_v27",
    } <= set(verdicts)


def test_committed_sf1_full_artifact_is_green():
    """Round 7 extends the ~sf1 gate from the value-sensitive slice to the
    FULL oracle registry (COMPARE_sf1_full.json). Every verdict must be
    'match' or 'match (py-oracle)' — the latter only for specs that
    actually register an oracle_py (currently the connected-components
    query, whose SQL oracle is temp-disk-infeasible in DuckDB at ~sf1) —
    and the artifact must cover every oracle-bearing query so it can't
    silently shrink."""
    path = "/root/repo/COMPARE_sf1_full.json"
    if not os.path.exists(path):
        pytest.skip("COMPARE_sf1_full.json not yet generated")
    with open(path) as fh:
        art = json.load(fh)
    verdicts = {k: v for k, v in art.items() if not k.startswith("_")}
    assert art["_failures"] == 0
    specs = all_specs()
    for name, v in verdicts.items():
        if v == "match":
            continue
        assert v.startswith("match (py-oracle"), f"{name}: {v}"
        assert specs[name].oracle_py is not None, f"{name}: py-oracle verdict without oracle_py"
    oracle_names = {n for n, s in specs.items() if s.oracle is not None}
    assert oracle_names <= set(verdicts), sorted(oracle_names - set(verdicts))


# ---------------------------------------------------------------------------
# events_changepoint overflow guard: prove it FIRES (not just that the
# bound holds) on data past the documented ~sf0.5 micro-unit envelope.
# ---------------------------------------------------------------------------
def test_changepoint_guard_fires_before_wrap(spark, tmp_path):
    """A level-shifted series (4k events at 0.01, then 4k at 999999)
    makes the true deviation d = n·P_i − i·P_n ≈ n²/4·1e12 ≈ 1.6e19 —
    past int64. With ANSI off Spark would silently wrap it; the in-plan
    assert_true must raise instead, naming the remediation (drop the
    micro scale). DuckDB refuses the same data independently (it sums
    into int128, then the final BIGINT cast overflows) — so NEITHER
    engine can return a wrapped argmax."""
    sf_dir = str(tmp_path / "hot")
    os.makedirs(sf_dir)
    n = 8000
    (
        gen_events(spark, n, partitions=4)
        .withColumn(
            "value",
            F.when(F.col("event_id") < n // 2, F.lit(0.01)).otherwise(F.lit(999_999.0)),
        )
        .withColumn("event_type", F.lit("hot"))
        .write.parquet(f"{sf_dir}/events.parquet")
    )
    spec = all_specs()["events_changepoint"]
    with pytest.raises(Exception, match="micro scale"):
        spec.builder(spark, sf_dir).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet/*.parquet'"
    )
    with pytest.raises(Exception):
        con.execute(spec.oracle).fetchall()


@given(
    n=st.integers(min_value=1, max_value=10**9),
    i=st.integers(min_value=0, max_value=10**9),
    p_sign=st.sampled_from([-1, 1]),
    t_sign=st.sampled_from([-1, 1]),
    # integer numerators over a fixed denominator: float fractions round —
    # int(1.0 * (2^62-1)) == 2^62, one PAST the bound, so the sampler
    # itself violated the premise it was testing (caught by hypothesis)
    p_num=st.integers(min_value=0, max_value=10**9),
    t_num=st.integers(min_value=0, max_value=10**9),
)
@settings(max_examples=200, deadline=None)
def test_guard_bound_covers_signed_combination(n, i, p_sign, t_sign, p_num, t_num):
    """The r7 bound — greatest(|p|,|t|) ≤ (2^63-1) DIV (2n) — implies the
    SIGNED combination |n·p − i·t| ≤ 2^63-1 for every i ≤ n, including the
    mixed-sign worst case that broke the r5 per-product bound (ADVICE r6)."""
    i = min(i, n)
    m = (1 << 63) - 1
    bound = m // (2 * n)
    p = p_sign * (bound * p_num // 10**9)
    t = t_sign * (bound * t_num // 10**9)
    assert abs(p) <= bound and abs(t) <= bound  # premise holds exactly
    assert abs(n * p - i * t) <= m


# ---------------------------------------------------------------------------
# Fuzz family 11: randomized BIG-magnitude dsum aggregates (the r7 drift
# zone). Every historical float-convention bug was value-dependent — a
# curated query passes while a nearby shape fails. This family renders
# seeded dialect-shared texts whose decimal sums land well past 2^53 micro
# units (where naive CAST(DECIMAL AS DOUBLE) drifts between engines) and
# asserts the split conversion stays bit-identical under random predicates,
# group keys, and integer scale multipliers.
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def gen_sf1_small(spark, tmp_path_factory):
    """scale=1.0 orders-only zone: per-status sums ~1.25e10 (micro value
    ~1.25e16 > 2^53) — squarely in the engine-divergent conversion range."""
    out = str(tmp_path_factory.mktemp("genscale") / "sf10")
    generate_scaled_fixtures(spark, out_dir=out, scale=1.0, partitions=8)
    return out


def test_random_big_dsum_match_duckdb(spark, gen_sf1_small):
    import random

    from spark_cherry_shuffle_service_spark.plans.oracle import dsum_sql
    from spark_cherry_shuffle_service_spark.sources.catalog import register_views

    register_views(spark, gen_sf1_small)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{gen_sf1_small}/orders.parquet/*.parquet'"
    )
    cmps = ["<", "<=", ">", ">=", "<>"]
    groups = ["o_orderstatus", "o_orderstatus, o_orderpriority", None]
    mismatches = []
    for seed in range(30):
        rng = random.Random(1000 + seed)
        k = rng.randint(2, 9)  # inflate sums deeper into the >2^53 zone
        pred = (
            f"o_orderkey % {rng.randint(2, 7)} <> {rng.randint(0, 1)} "
            f"AND o_totalprice {rng.choice(cmps)} {rng.randint(2_000, 400_000)}"
        )
        g = rng.choice(groups)
        sel = f"{g + ', ' if g else ''}COUNT(*) AS n, {dsum_sql(f'o_totalprice * {k}', 'tot')}"
        sql = f"SELECT {sel} FROM orders WHERE {pred}"
        if g:
            sql += f" GROUP BY {g}"
        s_rows = sorted(
            [tuple(r) for r in spark.sql(sql).collect()], key=repr
        )
        d_rows = sorted([tuple(r) for r in con.execute(sql).fetchall()], key=repr)
        if s_rows != d_rows:
            mismatches.append((seed, sql, s_rows[:2], d_rows[:2]))
    assert not mismatches, mismatches[:2]


# ---------------------------------------------------------------------------
# Regression lint: the naive DECIMAL→DOUBLE cast must never reappear. A new
# query written with CAST(SUM(DECIMAL) AS DOUBLE) would pass every fixture-
# scale test and silently drift at ~sf1 (the exact r7 failure mode), so ban
# the pattern statically — in every registered oracle string AND in the
# operator/plan sources (builder side).
# ---------------------------------------------------------------------------
# the canonical naive shape: CAST( SUM(CAST(ROUND(expr, 6) AS DECIMAL(p,6)))
# [OVER (...)] AS DOUBLE ) — the outer CAST must wrap the SUM directly
# (FLOOR-split conversions never have CAST(SUM immediately adjacent).
_NAIVE_CAST = re.compile(
    r"CAST\s*\(\s*SUM\s*\(\s*(CAST\s*\(\s*ROUND\s*\(|ROUND\s*\()"
    r".{0,200}?(::\s*)?DECIMAL\s*\(\d+,\s*6\s*\)\s*\)+\s*(OVER\s*\([^)]{0,200}\)\s*)?"
    r"AS\s+DOUBLE\s*\)",
    re.IGNORECASE | re.DOTALL,
)


def _is_split_form(text: str, m: re.Match) -> bool:
    # the split conversion contains FLOOR( immediately around the sum —
    # accept any match whose 60-char left context includes FLOOR(
    return "FLOOR(" in text[max(0, m.start() - 60) : m.start() + 40].upper()


def test_no_naive_decimal_double_cast_in_oracles():
    bad = []
    for name, spec in all_specs().items():
        if not spec.oracle:
            continue
        for m in _NAIVE_CAST.finditer(spec.oracle):
            if not _is_split_form(spec.oracle, m):
                bad.append((name, m.group(0)[:80]))
    assert not bad, f"naive DECIMAL→DOUBLE cast in oracles (use dsum_sql/dec_to_double_sql): {bad[:3]}"


def test_no_naive_decimal_double_cast_in_sources():
    import glob

    pat_sql = _NAIVE_CAST
    pat_py = re.compile(r'sum\s*\(\s*money\s*\([^)]*\)\s*\)\s*(\.over\([^)]*\))?\s*\.cast\(\s*"double"', re.IGNORECASE)
    bad = []
    roots = ("spark_cherry_shuffle_service_spark/operators", "spark_cherry_shuffle_service_spark/plans",
             "spark_cherry_shuffle_service_spark/functions", "spark_cherry_shuffle_service_spark/streaming")
    for root in roots:
        for p in glob.glob(f"/root/repo/{root}/*.py"):
            text = open(p).read()
            for m in pat_sql.finditer(text):
                if not _is_split_form(text, m):
                    bad.append((p.rsplit("/", 1)[-1], m.group(0)[:70]))
            for m in pat_py.finditer(text):
                bad.append((p.rsplit("/", 1)[-1], m.group(0)[:70]))
    assert not bad, f"naive decimal→double conversion (use dec_to_double): {bad[:3]}"


def test_changepoint_guard_arms_at_generated_sf2(spark, tmp_path):
    """The docstring envelope, demonstrated on honest data: at ~sf2
    (2M generated events, ~400k rows/type, mean value 50) the per-type
    total micro-sum t ≈ 2e13 exceeds the (2^63−1) DIV 2n ≈ 1.15e13
    bound, so the guard must raise on REALISTIC value distributions —
    not only on the crafted level-shift fixture — exactly where the
    documented remediation (drop the micro scale to 1e3) takes over."""
    sf_dir = str(tmp_path / "sf2")
    os.makedirs(sf_dir)
    gen_events(spark, 2_000_000, partitions=8).write.parquet(f"{sf_dir}/events.parquet")
    with pytest.raises(Exception, match="micro scale"):
        all_specs()["events_changepoint"].builder(spark, sf_dir).collect()


# ---------------------------------------------------------------------------
# The doc_scale axis (round 11): documents/embeddings are SF-invariant in
# the driver's design, so the fact-table `scale` never exercises the
# dedup / ANN / text-analysis / datapipe stack past sf0.1. gen_documents /
# gen_embeddings add that axis: fixture-faithful profiles (vocabulary read
# from the source corpus, n_chars 44..577, round-robin sources, ~0.32%
# planted exact dups, unit-norm 64-dim vectors), every value a pure md5
# function of the row id.
# ---------------------------------------------------------------------------


def test_doc_scale_generator_is_parallelism_invariant_and_faithful(spark):
    from spark_cherry_shuffle_service_spark.sources.genscale import (
        gen_documents,
        gen_embeddings,
    )

    src = "/root/testdata/sf0.1"
    a = sorted(gen_documents(spark, 1_000, src, partitions=4).collect())
    b = sorted(gen_documents(spark, 1_000, src, partitions=32).collect())
    assert a == b  # bit-identical at any parallelism
    ea = sorted(gen_embeddings(spark, 400, partitions=2).collect())
    eb = sorted(gen_embeddings(spark, 400, partitions=16).collect())
    assert ea == eb

    # Fixture-faithful profile: exact source round-robin, all langs, the
    # fixture vocabulary and length envelope, planted exact dups, n_chars
    # consistent with text.
    import collections

    rows = a
    srcs = collections.Counter(r.source for r in rows)
    assert len(srcs) == 20 and set(srcs.values()) == {50}
    assert {r.lang for r in rows} == {"en", "zh", "es", "fr", "de"}
    fixture_vocab: set[str] = set()
    import pyarrow.parquet as pq

    for chunk in pq.read_table(
        os.path.join(src, "documents.parquet"), columns=["text"]
    ).column("text").chunks:
        for s in chunk.to_pylist():
            fixture_vocab.update(s.split(" "))
    gen_vocab = {w for r in rows for w in r.text.split(" ")}
    assert gen_vocab <= fixture_vocab
    assert all(r.n_chars == len(r.text) for r in rows)
    texts = collections.Counter(r.text for r in rows)
    assert any(c > 1 for c in texts.values())  # planted exact dups
    lens = [r.n_chars for r in rows]
    assert min(lens) >= 30 and max(lens) <= 650  # fixture envelope 44..577

    # Embeddings: 64-dim float32 unit vectors, labels 0..9.
    import math

    for r in ea[:50]:
        assert len(r.embedding) == 64
        assert abs(math.sqrt(sum(x * x for x in r.embedding)) - 1.0) < 1e-5
    assert {r.label for r in ea} == set(range(10))


def test_committed_docs10x_artifact_is_green():
    """The 10x-documents differential artifact (COMPARE_docs10x.json):
    every oracle-bearing query from the documents/embeddings consumer
    modules green on a 50k-doc / 20k-vector generated corpus — the scale
    evidence the fact-table gates cannot provide for the dedup / ANN /
    text stack. Coverage is pinned to doc_scale_names() so the gate can
    never silently shrink."""
    from spark_cherry_shuffle_service_spark.sources.genscale import doc_scale_names

    path = "/root/repo/COMPARE_docs10x.json"
    if not os.path.exists(path):
        pytest.skip("COMPARE_docs10x.json not yet generated")
    with open(path) as fh:
        art = json.load(fh)
    verdicts = {k: v for k, v in art.items() if not k.startswith("_")}
    assert art["_failures"] == 0
    assert all(v.startswith("match") for v in verdicts.values())
    assert "_excluded" not in art or not art["_excluded"]
    assert set(doc_scale_names()) <= set(verdicts)
