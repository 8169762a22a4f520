"""Randomized differential testing (SQLancer-style) over the shared SQL
dialect: a seeded generator builds predicate trees over `orders`, renders
ONE dialect-shared SQL text, and runs it on Spark and DuckDB — any
count/sum divergence is an engine-semantics bug the curated oracles
missed. Aggregates are integer-only (COUNT + SUM of a key column), so no
float convention is involved; the generator is `random.Random(seed)`
with fixed seeds, fully deterministic run-to-run.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from spark_cherry_shuffle_service_spark.sources.catalog import register_views
from tests.conftest import SF_SMOKE

_NUM_COLS = {
    "o_orderkey": (1, 60000),
    "o_custkey": (1, 1500),
}
_MONEY_COL = ("o_totalprice", 800.0, 500000.0)
_DATE_COL = ("o_orderdate", 1992, 1998)
_STR_COLS = {
    "o_orderstatus": ["'O'", "'F'", "'P'"],
    "o_orderpriority": [
        "'1-URGENT'",
        "'2-HIGH'",
        "'3-MEDIUM'",
        "'4-NOT SPECIFIED'",
        "'5-LOW'",
    ],
}
_CMP = ["<", "<=", ">", ">=", "=", "<>"]


def _leaf(rng: random.Random) -> str:
    kind = rng.randrange(5)
    if kind == 0:
        col, (lo, hi) = rng.choice(sorted(_NUM_COLS.items()))
        return f"{col} {rng.choice(_CMP)} {rng.randint(lo, hi)}"
    if kind == 1:
        col, lo, hi = _MONEY_COL
        # integer-valued literal: no float-literal parsing differences
        return f"{col} {rng.choice(_CMP)} {rng.randint(int(lo), int(hi))}"
    if kind == 2:
        col, ylo, yhi = _DATE_COL
        d = f"DATE '{rng.randint(ylo, yhi)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}'"
        return f"CAST({col} AS DATE) {rng.choice(_CMP)} {d}"
    if kind == 3:
        col, vals = rng.choice(sorted(_STR_COLS.items()))
        if rng.random() < 0.5:
            return f"{col} = {rng.choice(vals)}"
        subset = rng.sample(vals, rng.randint(1, len(vals)))
        return f"{col} IN ({', '.join(subset)})"
    return f"o_orderpriority LIKE '{rng.randint(1, 5)}%'"


def _pred(rng: random.Random, depth: int) -> str:
    if depth == 0 or rng.random() < 0.35:
        return _leaf(rng)
    op = rng.choice(["AND", "OR"])
    left, right = _pred(rng, depth - 1), _pred(rng, depth - 1)
    neg = "NOT " if rng.random() < 0.2 else ""
    return f"{neg}(({left}) {op} ({right}))"


@pytest.mark.parametrize("block", range(4))
def test_random_predicates_match_duckdb(spark, block):
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'"
    )
    mismatches = []
    for seed in range(block * 25, block * 25 + 25):
        rng = random.Random(seed)
        sql = (
            "SELECT COUNT(*) AS n, COALESCE(SUM(o_custkey), 0) AS s "
            f"FROM orders WHERE {_pred(rng, 3)}"
        )
        srow = spark.sql(sql).first()
        drow = con.execute(sql).fetchone()
        if (srow["n"], srow["s"]) != (drow[0], drow[1]):
            mismatches.append((seed, sql, (srow["n"], srow["s"]), tuple(drow)))
    assert not mismatches, mismatches[:3]


_SEGMENTS = ["'AUTOMOBILE'", "'BUILDING'", "'FURNITURE'", "'MACHINERY'", "'HOUSEHOLD'"]


def _join_leaf(rng: random.Random) -> str:
    kind = rng.randrange(4)
    if kind == 0:
        return f"c_nationkey {rng.choice(_CMP)} {rng.randint(0, 24)}"
    if kind == 1:
        return f"c_acctbal {rng.choice(_CMP)} {rng.randint(-999, 9999)}"
    if kind == 2:
        subset = rng.sample(_SEGMENTS, rng.randint(1, 3))
        return f"c_mktsegment IN ({', '.join(subset)})"
    return _leaf(rng)


def _join_pred(rng: random.Random, depth: int) -> str:
    if depth == 0 or rng.random() < 0.35:
        return _join_leaf(rng)
    op = rng.choice(["AND", "OR"])
    return f"(({_join_pred(rng, depth - 1)}) {op} ({_join_pred(rng, depth - 1)}))"


@pytest.mark.parametrize("block", range(2))
def test_random_join_groupby_matches_duckdb(spark, block):
    """Join + GROUP BY fuzz: orders ⋈ customer with a random mixed-table
    predicate, grouped by a random categorical — full result-set compare
    (string keys + integer aggregates)."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{SF_SMOKE}/customer.parquet'")
    mismatches = []
    for seed in range(1000 + block * 20, 1000 + block * 20 + 20):
        rng = random.Random(seed)
        group = rng.choice(["o_orderstatus", "o_orderpriority", "c_mktsegment", "c_nationkey"])
        sql = (
            f"SELECT {group} AS k, COUNT(*) AS n, COALESCE(SUM(o_orderkey), 0) AS s "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            f"WHERE {_join_pred(rng, 3)} GROUP BY {group}"
        )
        srows = sorted((r["k"], r["n"], r["s"]) for r in spark.sql(sql).collect())
        drows = sorted(tuple(r) for r in con.execute(sql).fetchall())
        if srows != drows:
            mismatches.append((seed, sql))
    assert not mismatches, mismatches[:3]


@pytest.mark.parametrize("block", range(2))
def test_random_window_ranks_match_duckdb(spark, block):
    """Window fuzz: RANK / DENSE_RANK / ROW_NUMBER over random partition
    and order columns (o_orderkey appended as unique tiebreak, so all
    three are deterministic), reduced to integer per-group rank sums —
    pins frame-free window semantics across engines under random
    predicates."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    funcs = ["RANK()", "DENSE_RANK()", "ROW_NUMBER()"]
    parts = ["o_orderstatus", "o_orderpriority"]
    orders_by = ["o_custkey", "o_totalprice", "CAST(o_orderdate AS DATE)"]
    mismatches = []
    for seed in range(2000 + block * 15, 2000 + block * 15 + 15):
        rng = random.Random(seed)
        fn = rng.choice(funcs)
        part = rng.choice(parts)
        ob = rng.choice(orders_by)
        direction = rng.choice(["ASC", "DESC"])
        sql = (
            f"SELECT {part} AS k, COUNT(*) AS n, SUM(rk) AS s FROM ("
            f"SELECT {part}, {fn} OVER (PARTITION BY {part} "
            f"ORDER BY {ob} {direction}, o_orderkey) AS rk "
            f"FROM orders WHERE {_pred(rng, 2)}) GROUP BY {part}"
        )
        srows = sorted((r["k"], r["n"], r["s"]) for r in spark.sql(sql).collect())
        drows = sorted(tuple(r) for r in con.execute(sql).fetchall())
        if srows != drows:
            mismatches.append((seed, sql))
    assert not mismatches, mismatches[:3]


@pytest.mark.parametrize("block", range(2))
def test_random_setops_match_duckdb(spark, block):
    """Set-operation fuzz: UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL]
    between two randomly predicated projections of orders — pins bag vs
    set semantics (the ALL variants differ precisely on duplicate
    multiplicities) via integer count + sum."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    ops = ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL", "EXCEPT", "EXCEPT ALL"]
    mismatches = []
    for seed in range(3000 + block * 15, 3000 + block * 15 + 15):
        rng = random.Random(seed)
        op = rng.choice(ops)
        proj = "o_orderstatus, o_orderpriority, o_custkey % 50 AS ck"
        sql = (
            "SELECT COUNT(*) AS n, COALESCE(SUM(ck), 0) AS s FROM ("
            f"SELECT {proj} FROM orders WHERE {_pred(rng, 2)} "
            f"{op} "
            f"SELECT {proj} FROM orders WHERE {_pred(rng, 2)})"
        )
        srow = spark.sql(sql).first()
        drow = con.execute(sql).fetchone()
        if (srow["n"], srow["s"]) != (drow[0], drow[1]):
            mismatches.append((seed, sql, (srow["n"], srow["s"]), tuple(drow)))
    assert not mismatches, mismatches[:3]


def _li_leaf(rng: random.Random) -> str:
    kind = rng.randrange(5)
    if kind == 0:
        return f"l_quantity {rng.choice(_CMP)} {rng.randint(1, 50)}"
    if kind == 1:
        # discount is k/100 exactly; integer-scaled compare avoids float literals
        return f"CAST(l_discount * 100 AS BIGINT) {rng.choice(_CMP)} {rng.randint(0, 10)}"
    if kind == 2:
        d = f"DATE '{rng.randint(1992, 1998)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}'"
        return f"CAST(l_shipdate AS DATE) {rng.choice(_CMP)} {d}"
    if kind == 3:
        return f"l_returnflag = '{rng.choice(['A', 'N', 'R'])}'"
    return f"l_linestatus = '{rng.choice(['O', 'F'])}'"


def _li_pred(rng: random.Random, depth: int) -> str:
    if depth == 0 or rng.random() < 0.4:
        return _li_leaf(rng)
    op = rng.choice(["AND", "OR"])
    return f"(({_li_pred(rng, depth - 1)}) {op} ({_li_pred(rng, depth - 1)}))"


@pytest.mark.parametrize("block", range(2))
def test_random_lineitem_predicates_match_duckdb(spark, block):
    """Lineitem fuzz: quantity / integer-scaled discount / ship-date /
    flag leaves; integer aggregates (quantity is integral-valued, summed
    as BIGINT)."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF_SMOKE}/lineitem.parquet'")
    mismatches = []
    for seed in range(4000 + block * 20, 4000 + block * 20 + 20):
        rng = random.Random(seed)
        sql = (
            "SELECT COUNT(*) AS n, COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0) AS s "
            f"FROM lineitem WHERE {_li_pred(rng, 3)}"
        )
        srow = spark.sql(sql).first()
        drow = con.execute(sql).fetchone()
        if (srow["n"], srow["s"]) != (drow[0], drow[1]):
            mismatches.append((seed, sql, (srow["n"], srow["s"]), tuple(drow)))
    assert not mismatches, mismatches[:3]


@pytest.mark.parametrize("block", range(2))
def test_random_correlated_exists_match_duckdb(spark, block):
    """Correlated-subquery fuzz: EXISTS / NOT EXISTS / IN probes from
    orders into a randomly predicated lineitem — pins decorrelation
    semantics (semi/anti rewrite) under random inner predicates."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF_SMOKE}/lineitem.parquet'")
    mismatches = []
    for seed in range(5000 + block * 12, 5000 + block * 12 + 12):
        rng = random.Random(seed)
        form = rng.randrange(3)
        inner = _li_pred(rng, 2)
        if form == 0:
            where = f"EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND ({inner}))"
        elif form == 1:
            where = f"NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND ({inner}))"
        else:
            where = f"o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE {inner})"
        if rng.random() < 0.5:
            where = f"({where}) AND ({_pred(rng, 1)})"
        sql = f"SELECT COUNT(*) AS n, COALESCE(SUM(o_custkey), 0) AS s FROM orders WHERE {where}"
        srow = spark.sql(sql).first()
        drow = con.execute(sql).fetchone()
        if (srow["n"], srow["s"]) != (drow[0], drow[1]):
            mismatches.append((seed, sql, (srow["n"], srow["s"]), tuple(drow)))
    assert not mismatches, mismatches[:3]


@pytest.mark.parametrize("block", range(2))
def test_random_topk_match_duckdb(spark, block):
    """ORDER BY + LIMIT fuzz with a unique tiebreak: the exact top-20 key
    lists must be identical (pins TakeOrderedAndProject semantics,
    including desc order, under random predicates)."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    mismatches = []
    for seed in range(6000 + block * 15, 6000 + block * 15 + 15):
        rng = random.Random(seed)
        ob = rng.choice(["o_custkey", "o_totalprice", "CAST(o_orderdate AS DATE)"])
        direction = rng.choice(["ASC", "DESC"])
        sql = (
            f"SELECT o_orderkey FROM orders WHERE {_pred(rng, 2)} "
            f"ORDER BY {ob} {direction}, o_orderkey LIMIT 20"
        )
        skeys = [r["o_orderkey"] for r in spark.sql(sql).collect()]
        dkeys = [r[0] for r in con.execute(sql).fetchall()]
        if skeys != dkeys:
            mismatches.append((seed, sql, skeys[:5], dkeys[:5]))
    assert not mismatches, mismatches[:3]


@pytest.mark.parametrize("block", range(2))
def test_random_left_join_on_clause_match_duckdb(spark, block):
    """Outer-join fuzz: LEFT JOIN with the random lineitem predicate in
    the ON clause (not WHERE) — the null-extension rule that trips
    engines: ON-clause filters restrict the RIGHT side only, every left
    row survives. Checked via COUNT(*), COUNT(right col) (null-aware)
    and an integer sum over the null-extended column."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF_SMOKE}/lineitem.parquet'")
    mismatches = []
    for seed in range(7000 + block * 12, 7000 + block * 12 + 12):
        rng = random.Random(seed)
        on_extra = _li_pred(rng, 2)
        where = _pred(rng, 1) if rng.random() < 0.5 else "1=1"
        sql = (
            "SELECT COUNT(*) AS n, COUNT(l_orderkey) AS nm, "
            "COALESCE(SUM(CAST(COALESCE(l_quantity, 0) AS BIGINT)), 0) AS s "
            "FROM orders LEFT JOIN lineitem "
            f"ON l_orderkey = o_orderkey AND ({on_extra}) "
            f"WHERE {where}"
        )
        srow = spark.sql(sql).first()
        drow = con.execute(sql).fetchone()
        if (srow["n"], srow["nm"], srow["s"]) != (drow[0], drow[1], drow[2]):
            mismatches.append((seed, sql, tuple(srow), tuple(drow)))
    assert not mismatches, mismatches[:3]


@pytest.mark.parametrize("block", range(2))
def test_random_window_frames_match_duckdb(spark, block):
    """Window-FRAME fuzz (round 7 — frames were curated-only): SUM /
    MIN / MAX / COUNT over random ROWS frames (k PRECEDING ... m
    FOLLOWING, mixed with UNBOUNDED / CURRENT ROW bounds) behind a
    unique o_orderkey tiebreak, plus a RANGE variant over the single
    integer order key o_custkey (value-based frames are deterministic
    under ties without a tiebreak). Reduced to integer per-group sums of
    the framed aggregate."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    funcs = ["SUM(v)", "MIN(v)", "MAX(v)", "COUNT(*)"]
    parts = ["o_orderstatus", "o_orderpriority"]
    orders_by = ["o_custkey", "o_totalprice", "CAST(o_orderdate AS DATE)"]
    mismatches = []
    for seed in range(8000 + block * 14, 8000 + block * 14 + 14):
        rng = random.Random(seed)
        fn = rng.choice(funcs)
        part = rng.choice(parts)
        starts = ["UNBOUNDED PRECEDING", f"{rng.randint(1, 20)} PRECEDING", "CURRENT ROW"]
        ends = ["CURRENT ROW", f"{rng.randint(1, 20)} FOLLOWING", "UNBOUNDED FOLLOWING"]
        frame_kind = "RANGE" if rng.random() < 0.3 else "ROWS"
        if frame_kind == "RANGE":
            # value-based frame: single integer order column, numeric bounds
            ob = "o_custkey ASC"
            start = rng.choice(["UNBOUNDED PRECEDING", f"{rng.randint(1, 50)} PRECEDING"])
            end = rng.choice(["CURRENT ROW", f"{rng.randint(1, 50)} FOLLOWING"])
        else:
            ob = f"{rng.choice(orders_by)} {rng.choice(['ASC', 'DESC'])}, o_orderkey"
            start, end = rng.choice(starts), rng.choice(ends)
        sql = (
            f"SELECT k, COUNT(*) AS n, SUM(w) AS s FROM ("
            f"SELECT {part} AS k, {fn} OVER (PARTITION BY {part} ORDER BY {ob} "
            f"{frame_kind} BETWEEN {start} AND {end}) AS w "
            f"FROM (SELECT *, o_custkey % 89 AS v FROM orders WHERE {_pred(rng, 2)})"
            f") GROUP BY k"
        )
        srows = sorted((r["k"], r["n"], r["s"]) for r in spark.sql(sql).collect())
        drows = sorted(tuple(r) for r in con.execute(sql).fetchall())
        if srows != drows:
            mismatches.append((seed, sql))
    assert not mismatches, mismatches[:3]


@pytest.mark.parametrize("block", range(2))
def test_random_interval_joins_match_duckdb(spark, block):
    """Non-equi interval-join fuzz (round 7 — BETWEEN joins were
    curated-only): per-customer self-join of orders where the right
    key falls in a random asymmetric window around the left key
    (order-key or integer-compared money), optional strict-inequality
    and no-self-pair variants; the equi key bounds the fan-out. Integer
    COUNT + modular SUM compare."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    mismatches = []
    for seed in range(9000 + block * 12, 9000 + block * 12 + 12):
        rng = random.Random(seed)
        if rng.random() < 0.5:
            lo, hi = rng.randint(0, 5000), rng.randint(0, 5000)
            rngpred = (
                f"b.o_orderkey BETWEEN a.o_orderkey - {lo} AND a.o_orderkey + {hi}"
            )
        else:
            lo, hi = rng.randint(0, 20000), rng.randint(0, 20000)
            # money compared at integer width: double vs int comparison is
            # exact in both engines (no float literals, no arithmetic ties)
            rngpred = (
                f"b.o_totalprice >= a.o_totalprice - {lo} "
                f"AND b.o_totalprice {'<' if rng.random() < 0.3 else '<='} "
                f"a.o_totalprice + {hi}"
            )
        noself = "AND a.o_orderkey <> b.o_orderkey " if rng.random() < 0.5 else ""
        sql = (
            "SELECT COUNT(*) AS n, COALESCE(SUM(b.o_orderkey % 97), 0) AS s "
            "FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey "
            f"AND {rngpred} {noself}"
            f"WHERE {_pred(rng, 1).replace('o_', 'a.o_')}"
        )
        srow = spark.sql(sql).first()
        drow = con.execute(sql).fetchone()
        if (srow["n"], srow["s"]) != (drow[0], drow[1]):
            mismatches.append((seed, sql, (srow["n"], srow["s"]), tuple(drow)))
    assert not mismatches, mismatches[:3]


def _gap_events(rng: random.Random, threshold_us: int):
    """Adversarial per-user timestamp chains: most gaps land ON or within
    ±1 µs / ±400 ms of the session threshold — exactly the band where the
    round-7 sessionize bug lived (a second-truncated comparison reads a
    1800.4 s gap as 1800 and merges the session)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 15, 0, 0, 0)
    adversarial = [
        threshold_us,
        threshold_us + 1,
        max(threshold_us - 1, 1),
        threshold_us + 400_000,
        max(threshold_us - 400_000, 1),
    ]
    rows = []
    for user in range(20):
        t = base + dt.timedelta(microseconds=rng.randint(0, 10**6))
        for _ in range(rng.randint(5, 40)):
            rows.append((user, t))
            if rng.random() < 0.7:
                gap = rng.choice(adversarial)
            else:
                gap = rng.randint(1, 3 * threshold_us)
            t += dt.timedelta(microseconds=gap)
    return rows


@pytest.mark.parametrize("block", range(2))
def test_random_subsecond_session_gaps_match_duckdb(spark, block):
    """Sub-second sessionization fuzz (round 7, family 11 — born from the
    events_sessionize microsecond bug): random gap thresholds, INCLUDING
    fractional-second ones, applied as a dialect-shared
    `ts - LAG(ts) > INTERVAL '<T>' SECOND` gaps-and-islands over
    microsecond-resolution chains engineered to straddle the threshold by
    ±1 µs and ±400 ms. Both engines must agree on session counts and
    session-id checksums exactly; any whole-second shortcut in either
    engine's interval comparison diverges immediately."""
    import pandas as pd

    con = duckdb.connect()
    mismatches = []
    for seed in range(11000 + block * 13, 11000 + block * 13 + 13):
        rng = random.Random(seed)
        # threshold: the canonical 30 min, whole seconds, or arbitrary µs
        kind = rng.randrange(3)
        if kind == 0:
            t_us, t_lit = 1_800_000_000, "1800"
        elif kind == 1:
            secs = rng.randint(1, 3600)
            t_us, t_lit = secs * 1_000_000, str(secs)
        else:
            t_us = rng.randint(1, 3600) * 1_000_000 + rng.randint(1, 999_999)
            t_lit = f"{t_us // 1_000_000}.{t_us % 1_000_000:06d}"
        pdf = pd.DataFrame(
            _gap_events(rng, t_us), columns=["user_id", "ts"]
        ).astype({"ts": "datetime64[us]"})
        spark.createDataFrame(pdf).createOrReplaceTempView("gap_events")
        con.register("gap_events", pdf)
        sql = f"""
        WITH flagged AS (
          SELECT user_id, ts,
                 CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           > INTERVAL '{t_lit}' SECOND
                      THEN 1 ELSE 0 END AS is_new
          FROM gap_events
        ), sessions AS (
          SELECT user_id,
                 SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM flagged
        )
        SELECT COUNT(*) AS n_events,
               CAST(COUNT(DISTINCT user_id * 1000 + sid) AS BIGINT) AS n_sessions,
               CAST(SUM(user_id * 1000 + sid) AS BIGINT) AS checksum
        FROM sessions
        """
        srow = spark.sql(sql).first()
        drow = con.execute(sql).fetchone()
        con.unregister("gap_events")
        if (srow["n_events"], srow["n_sessions"], srow["checksum"]) != tuple(drow):
            mismatches.append(
                (seed, t_lit, (srow["n_events"], srow["n_sessions"], srow["checksum"]), tuple(drow))
            )
    assert not mismatches, mismatches[:3]


@pytest.mark.parametrize("block", range(2))
def test_random_null_semantics_match_duckdb(spark, block):
    """NULL-semantics fuzz (round 7, family 12): NULLIF-derived nullable
    columns over orders exercise the corners where engines historically
    diverge — COUNT(*) vs COUNT(col) vs COUNT(DISTINCT col), aggregates
    over all-NULL groups, the NULL group in GROUP BY, three-valued logic
    in WHERE (=, <>, IS NULL, IS NOT DISTINCT FROM, IN-lists containing
    NULL), and explicit NULLS FIRST/LAST ordering (the engines' DEFAULTS
    differ: Spark ASC=NULLS FIRST, DuckDB ASC=NULLS LAST — every ORDER BY
    here is explicit). One dialect-shared SQL text per seed."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    mismatches = []
    for seed in range(12000 + block * 13, 12000 + block * 13 + 13):
        rng = random.Random(seed)
        m1, m2 = rng.randint(2, 9), rng.randint(2, 9)
        r1, r2 = rng.randrange(m1), rng.randrange(m2)
        inner = (
            f"SELECT NULLIF(o_custkey % {m1}, {r1}) AS k, "
            f"NULLIF(o_orderkey % {m2}, {r2}) AS v, o_orderkey "
            f"FROM orders WHERE {_pred(rng, 2)}"
        )
        where_opts = [
            "k = v",
            "k <> v",
            "k IS NULL",
            "k IS NOT NULL",
            "k IS NOT DISTINCT FROM v",
            f"k IN (0, 1, {r1})",
            "k IN (0, 1, NULL)",
            "NOT (k = v)",
        ]
        shape = rng.randrange(3)
        if shape == 0:
            sql = (
                "SELECT COUNT(*) AS a, COUNT(k) AS b, COUNT(DISTINCT k) AS c, "
                "COALESCE(CAST(SUM(v) AS BIGINT), -1) AS d, "
                "COALESCE(MIN(v), -1) AS e, COALESCE(MAX(v), -1) AS f "
                f"FROM ({inner}) t WHERE {rng.choice(where_opts)}"
            )
        elif shape == 1:
            sql = (
                "SELECT COALESCE(k, -1) AS kk, COUNT(*) AS n, COUNT(v) AS nv, "
                "COALESCE(CAST(SUM(v) AS BIGINT), -1) AS s "
                f"FROM ({inner}) t GROUP BY k"
            )
        else:
            nf = rng.choice(["NULLS FIRST", "NULLS LAST"])
            direction = rng.choice(["ASC", "DESC"])
            sql = (
                "SELECT COALESCE(k, -1) AS kk, o_orderkey "
                f"FROM ({inner}) t WHERE {rng.choice(where_opts)} "
                f"ORDER BY k {direction} {nf}, o_orderkey LIMIT 50"
            )
        srows = [tuple(r) for r in spark.sql(sql).collect()]
        drows = [tuple(r) for r in con.execute(sql).fetchall()]
        if shape == 1:  # unordered shape: compare as multisets
            srows, drows = sorted(srows), sorted(drows)
        if srows != drows:
            mismatches.append((seed, sql, srows[:3], drows[:3]))
    assert not mismatches, mismatches[:3]


def _date_expr(rng: random.Random) -> str:
    """A random dialect-shared date expression over o_orderdate. EXTRACT
    fields and calendar ops verified engine-identical by probe (leap-day
    clamping, month-end clamping, ISO week, Monday date_trunc('week'));
    DOW is deliberately EXCLUDED — Spark numbers Sunday=1, DuckDB
    Sunday=0, a documented dialect difference, not a bug. DATE+INTERVAL
    and date_trunc are re-CAST to DATE because DuckDB yields TIMESTAMP
    where Spark yields DATE."""
    d = "CAST(o_orderdate AS DATE)"
    kind = rng.randrange(4)
    if kind == 0:
        field = rng.choice(["YEAR", "MONTH", "DAY", "QUARTER", "DOY", "WEEK"])
        return f"EXTRACT({field} FROM {d})"
    if kind == 1:
        unit, span = rng.choice([("DAY", 400), ("MONTH", 14), ("YEAR", 3)])
        return f"CAST({d} + INTERVAL {rng.randint(1, span)} {unit} AS DATE)"
    if kind == 2:
        unit = rng.choice(["month", "quarter", "year", "week"])
        return f"CAST(date_trunc('{unit}', {d}) AS DATE)"
    return f"last_day({d})"


@pytest.mark.parametrize("block", range(2))
def test_random_date_expressions_match_duckdb(spark, block):
    """Datetime-function fuzz (round 7, family 13): random EXTRACT /
    DATE+INTERVAL (month-end and leap-day clamping included by
    construction — interval spans cross both) / date_trunc / last_day
    expressions over o_orderdate, consumed either as a GROUP BY key or
    inside a WHERE comparison. One shared SQL per seed; integer COUNT +
    modular SUM (and the derived value itself) compare exactly."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    mismatches = []
    for seed in range(13000 + block * 13, 13000 + block * 13 + 13):
        rng = random.Random(seed)
        e = _date_expr(rng)
        if rng.random() < 0.5:
            sql = (
                f"SELECT {e} AS k, COUNT(*) AS n, "
                "CAST(SUM(o_orderkey % 97) AS BIGINT) AS s "
                f"FROM orders WHERE {_pred(rng, 2)} GROUP BY {e}"
            )
        else:
            if "EXTRACT" in e:
                cmp_lit = str(rng.randint(1, 12))
            else:
                cmp_lit = (
                    f"DATE '{rng.randint(1992, 1999)}-"
                    f"{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}'"
                )
            sql = (
                "SELECT COUNT(*) AS n, "
                "COALESCE(CAST(SUM(o_custkey % 89) AS BIGINT), -1) AS s "
                f"FROM orders WHERE {e} {rng.choice(_CMP)} {cmp_lit}"
            )
        srows = sorted(tuple(r) for r in spark.sql(sql).collect())
        drows = sorted(tuple(r) for r in con.execute(sql).fetchall())
        if srows != drows:
            mismatches.append((seed, sql, srows[:3], drows[:3]))
    assert not mismatches, mismatches[:3]


def _string_expr(rng: random.Random, col: str) -> str:
    """A random dialect-shared string expression. All constituent
    functions probe-verified identical (1-based SUBSTR incl. the
    length-overrun clamp, TRIM family, PAD family, POSITION, REVERSE,
    REPEAT, LEFT/RIGHT, ||, LIKE with ESCAPE). Positions stay >= 1 —
    zero/negative SUBSTR positions are a known dialect divergence the
    engine never emits."""
    kind = rng.randrange(7)
    if kind == 0:
        return f"SUBSTR({col}, {rng.randint(1, 20)}, {rng.randint(1, 30)})"
    if kind == 1:
        return f"UPPER(SUBSTR({col}, {rng.randint(1, 10)}, {rng.randint(1, 12)}))"
    if kind == 2:
        return f"REPLACE({col}, '{rng.choice('aeiou')}', '{rng.choice('*#+')}')"
    if kind == 3:
        return f"LPAD(LEFT({col}, {rng.randint(1, 8)}), {rng.randint(1, 12)}, '.')"
    if kind == 4:
        return f"RIGHT(REVERSE({col}), {rng.randint(1, 10)})"
    if kind == 5:
        return f"SUBSTR({col}, POSITION('{rng.choice('etor')}' IN {col}) + 1, {rng.randint(1, 9)})"
    # STRING, not VARCHAR: Spark rejects length-less VARCHAR; both engines
    # accept STRING (DuckDB aliases it to VARCHAR)
    return f"LOWER({col}) || '_' || CAST(LENGTH({col}) % {rng.randint(2, 9)} AS STRING)"


@pytest.mark.parametrize("block", range(2))
def test_random_string_expressions_match_duckdb(spark, block):
    """String-function fuzz (round 7, family 14): random compositions of
    the shared string surface over documents.text (real multi-word prose)
    and orders.o_orderpriority, consumed as GROUP BY keys, LIKE subjects,
    or value columns. Byte-identical comparison — any off-by-one in
    SUBSTR/POSITION indexing or PAD/TRIM edge handling diverges."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'")
    mismatches = []
    for seed in range(14000 + block * 13, 14000 + block * 13 + 13):
        rng = random.Random(seed)
        if rng.random() < 0.6:
            tbl, col, key = "documents", "text", "doc_id"
        else:
            tbl, col, key = "orders", "o_orderpriority", "o_orderkey"
        e = _string_expr(rng, col)
        shape = rng.randrange(3)
        if shape == 0:
            sql = (
                f"SELECT {e} AS k, COUNT(*) AS n FROM {tbl} GROUP BY {e}"
            )
        elif shape == 1:
            pat = rng.choice(["%a%", "%the%", "%1%", "_%e%", "%d"])
            sql = (
                "SELECT COUNT(*) AS n, "
                f"COALESCE(CAST(SUM(LENGTH({e})) AS BIGINT), -1) AS s "
                f"FROM {tbl} WHERE {e} LIKE '{pat}'"
            )
        else:
            sql = (
                f"SELECT {key} AS id, {e} AS v FROM {tbl} "
                f"WHERE LENGTH({col}) % {rng.randint(2, 7)} = 0"
            )
        srows = sorted((tuple(r) for r in spark.sql(sql).collect()), key=repr)
        drows = sorted((tuple(r) for r in con.execute(sql).fetchall()), key=repr)
        if srows != drows:
            mismatches.append((seed, sql, srows[:2], drows[:2]))
    assert not mismatches, mismatches[:3]


def _int_expr(rng: random.Random, depth: int) -> str:
    """A random dialect-shared BIGINT expression over the order keys.
    Probe-verified identical: % is C-style remainder (sign of dividend)
    in BOTH engines (-7%3 = -1, 7%-3 = 1), and +, -, *, ABS, GREATEST,
    LEAST, CASE are closed over integers. EXCLUDED by design: `/` and
    DIV (Spark DIV truncates toward zero, DuckDB // floors — documented
    divergence; the engine uses the SIGN/ABS recipe, CLAUDE.md) and SIGN
    (DOUBLE in Spark, TINYINT in DuckDB). Moduli keep magnitudes small
    enough that no SUM can overflow int64."""
    if depth == 0 or rng.random() < 0.3:
        return rng.choice(
            ["(o_orderkey % 211)", "(o_custkey % 97)", str(rng.randint(-50, 50))]
        )
    a, b = _int_expr(rng, depth - 1), _int_expr(rng, depth - 1)
    kind = rng.randrange(6)
    if kind == 0:
        return f"({a} + {b})"
    if kind == 1:
        return f"({a} - {b})"
    if kind == 2:
        return f"(({a}) * ({b}) % 1009)"
    if kind == 3:
        return f"ABS({a})"
    if kind == 4:
        return f"{rng.choice(['GREATEST', 'LEAST'])}({a}, {b})"
    return f"(CASE WHEN {a} < {b} THEN {a} ELSE {b} + 1 END)"


def _having_pred(rng: random.Random) -> str:
    leafs = [
        f"COUNT(*) {rng.choice(_CMP)} {rng.randint(1, 40)}",
        f"MIN(o_orderkey) % {rng.randint(2, 13)} {rng.choice(['=', '<>'])} {rng.randint(0, 5)}",
        f"MAX(o_custkey) {rng.choice(_CMP)} {rng.randint(1, 1500)}",
        f"SUM(o_orderkey % 101) {rng.choice(_CMP)} {rng.randint(0, 5000)}",
    ]
    if rng.random() < 0.5:
        return rng.choice(leafs)
    a, b = rng.sample(leafs, 2)
    return f"({a}) {rng.choice(['AND', 'OR'])} ({b})"


@pytest.mark.parametrize("block", range(2))
def test_random_int_arith_having_match_duckdb(spark, block):
    """Integer-arithmetic + HAVING fuzz (round 7, family 15): a random
    BIGINT expression (negatives, C-style %, bounded products) as the
    GROUP BY key and as the summed value, filtered post-aggregation by a
    random HAVING tree over COUNT/MIN/MAX/SUM. Locks the shared integer
    dialect subset the curated oracles use (including the negative-%
    corner the SIGN/ABS division recipe depends on)."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    mismatches = []
    for seed in range(15000 + block * 13, 15000 + block * 13 + 13):
        rng = random.Random(seed)
        kexpr = _int_expr(rng, 2)
        vexpr = _int_expr(rng, 3)
        sql = (
            f"SELECT CAST({kexpr} AS BIGINT) AS k, COUNT(*) AS n, "
            f"CAST(SUM({vexpr}) AS BIGINT) AS s "
            f"FROM orders WHERE {_pred(rng, 2)} "
            f"GROUP BY CAST({kexpr} AS BIGINT) HAVING {_having_pred(rng)}"
        )
        srows = sorted(tuple(r) for r in spark.sql(sql).collect())
        drows = sorted(tuple(r) for r in con.execute(sql).fetchall())
        if srows != drows:
            mismatches.append((seed, sql, srows[:3], drows[:3]))
    assert not mismatches, mismatches[:3]


@pytest.mark.parametrize("block", range(2))
def test_random_distinct_aggregates_match_duckdb(spark, block):
    """DISTINCT-aggregate fuzz (round 7, family 16): COUNT(DISTINCT e) and
    SUM(DISTINCT e) over random integer expressions, grouped by a random
    categorical, beside a plain COUNT(*) — exercises Spark's distinct-agg
    Expand rewrite (multiple distinct aggregates in one SELECT) against
    DuckDB's direct evaluation."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    mismatches = []
    for seed in range(16000 + block * 13, 16000 + block * 13 + 13):
        rng = random.Random(seed)
        e1 = _int_expr(rng, 2)
        e2 = _int_expr(rng, 2)
        group = rng.choice(["o_orderstatus", "o_orderpriority"])
        sql = (
            f"SELECT {group} AS g, COUNT(*) AS n, "
            f"COUNT(DISTINCT {e1}) AS nd, "
            f"CAST(SUM(DISTINCT {e2}) AS BIGINT) AS sd "
            f"FROM orders WHERE {_pred(rng, 2)} GROUP BY {group}"
        )
        srows = sorted(tuple(r) for r in spark.sql(sql).collect())
        drows = sorted(tuple(r) for r in con.execute(sql).fetchall())
        if srows != drows:
            mismatches.append((seed, sql, srows[:3], drows[:3]))
    assert not mismatches, mismatches[:3]


@pytest.mark.parametrize("block", range(2))
def test_random_scalar_subqueries_match_duckdb(spark, block):
    """Scalar-subquery fuzz (round 7, family 17): an uncorrelated integer
    scalar subquery (COUNT / MIN / MAX / modular SUM under a random
    predicate) compared against a random outer integer expression —
    exercises Spark's subquery-broadcast planning against DuckDB's direct
    evaluation. Integer-only: AVG is excluded to keep both engines in
    exact arithmetic."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    mismatches = []
    for seed in range(17000 + block * 13, 17000 + block * 13 + 13):
        rng = random.Random(seed)
        inner_agg = rng.choice(
            [
                "COUNT(*) % 997",
                "MIN(o_orderkey) % 211",
                "MAX(o_custkey) % 97",
                "SUM(o_orderkey % 101) % 1009",
            ]
        )
        scalar = (
            f"(SELECT CAST({inner_agg} AS BIGINT) FROM orders WHERE {_pred(rng, 2)})"
        )
        outer = _int_expr(rng, 2)
        sql = (
            "SELECT COUNT(*) AS n, "
            "COALESCE(CAST(SUM(o_custkey % 89) AS BIGINT), -1) AS s "
            f"FROM orders WHERE {outer} {rng.choice(_CMP)} {scalar}"
        )
        srows = sorted(tuple(r) for r in spark.sql(sql).collect())
        drows = sorted(tuple(r) for r in con.execute(sql).fetchall())
        if srows != drows:
            mismatches.append((seed, sql, srows[:3], drows[:3]))
    assert not mismatches, mismatches[:3]


@pytest.mark.parametrize("block", range(2))
def test_random_limit_offset_pagination_match_duckdb(spark, block):
    """Pagination fuzz (round 7, family 18): ORDER BY a unique-key-anchored
    sort with random LIMIT/OFFSET windows, optionally under a random
    predicate or over a grouped derived table — the result must be the
    exact page on both engines (any off-by-one in OFFSET handling or an
    unstable sort diverges; every sort ends with the unique key so pages
    are well-defined)."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    mismatches = []
    for seed in range(18000 + block * 13, 18000 + block * 13 + 13):
        rng = random.Random(seed)
        lim, off = rng.randint(1, 40), rng.randint(0, 60)
        direction = rng.choice(["ASC", "DESC"])
        if rng.random() < 0.5:
            sql = (
                "SELECT o_orderkey AS k, o_custkey AS c FROM orders "
                f"WHERE {_pred(rng, 2)} "
                f"ORDER BY o_custkey {direction}, o_orderkey "
                f"LIMIT {lim} OFFSET {off}"
            )
        else:
            sql = (
                "SELECT c, n FROM ("
                "  SELECT o_custkey AS c, COUNT(*) AS n FROM orders GROUP BY o_custkey"
                f") g ORDER BY n {direction}, c LIMIT {lim} OFFSET {off}"
            )
        srows = [tuple(r) for r in spark.sql(sql).collect()]
        drows = [tuple(r) for r in con.execute(sql).fetchall()]
        if srows != drows:  # ORDER-SENSITIVE compare: pages must be identical
            mismatches.append((seed, sql, srows[:3], drows[:3]))
    assert not mismatches, mismatches[:3]


@pytest.mark.parametrize("block", range(2))
def test_random_rollup_cube_match_duckdb(spark, block):
    """ROLLUP/CUBE fuzz (round 7, family 19): random grouping-column
    subsets (categoricals + a modular integer expression) under ROLLUP or
    CUBE, with GROUPING() level markers and COALESCE'd NULL labels —
    locks the Expand rewrite, subtotal-row NULL semantics, and
    GROUPING() numbering across random shapes. Keys are CAST to STRING
    inside the COALESCE so subtotal labels compare identically.

    EMPTY-INPUT divergence (found by this family's first run, seed
    19000): on a WHERE that matches zero rows, DuckDB emits the
    grand-total grouping-set row (COUNT=0, SUM=NULL) — the () set acts
    like a global aggregate — while Spark's Expand+Aggregate over zero
    rows yields an EMPTY result. That is a dialect difference, not an
    engine bug (the curated rollup operators never aggregate an empty
    relation), so empty-input seeds assert the divergence explicitly and
    the value compare runs on non-empty inputs only."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    pool = ["o_orderstatus", "o_orderpriority", "(o_custkey % 10)"]
    mismatches = []
    for seed in range(19000 + block * 13, 19000 + block * 13 + 13):
        rng = random.Random(seed)
        cols = rng.sample(pool, rng.randint(2, 3))
        op = rng.choice(["ROLLUP", "CUBE"])
        keys = ", ".join(
            f"COALESCE(CAST({c} AS STRING), '(all)') AS k{i}" for i, c in enumerate(cols)
        )
        lvl = " + ".join(f"GROUPING({c})" for c in cols)
        pred = _pred(rng, 2)
        sql = (
            f"SELECT {keys}, CAST({lvl} AS BIGINT) AS lvl, COUNT(*) AS n, "
            "CAST(SUM(o_orderkey % 97) AS BIGINT) AS s "
            f"FROM orders WHERE {pred} "
            f"GROUP BY {op}({', '.join(cols)})"
        )
        srows = sorted(tuple(r) for r in spark.sql(sql).collect())
        drows = sorted(tuple(r) for r in con.execute(sql).fetchall())
        n_in = con.execute(f"SELECT COUNT(*) FROM orders WHERE {pred}").fetchone()[0]
        if n_in == 0:
            # pinned divergence: Spark empty, DuckDB the lone grand-total row
            if srows != [] or len(drows) != 1 or drows[0][-2] != 0:
                mismatches.append((seed, "empty-input contract", srows[:3], drows[:3]))
            continue
        if srows != drows:
            mismatches.append((seed, sql, srows[:3], drows[:3]))
    assert not mismatches, mismatches[:3]


def _li_inner_pred(rng: random.Random) -> str:
    """Integer/string-only inner predicate over the correlated lineitem
    scan (no float literals — the family tests decorrelation, not the
    float convention)."""
    kind = rng.randrange(4)
    if kind == 0:
        return f"l.l_linenumber {rng.choice(_CMP)} {rng.randint(1, 7)}"
    if kind == 1:
        return f"l.l_quantity {rng.choice(_CMP)} {rng.randint(1, 50)}"
    if kind == 2:
        flags = rng.sample(["'A'", "'N'", "'R'"], rng.randint(1, 2))
        return f"l.l_returnflag IN ({', '.join(flags)})"
    return f"l.l_suppkey {rng.choice(_CMP)} {rng.randint(0, 100)}"


def _correlated_pred(rng: random.Random) -> str:
    """One random correlated-subquery predicate over orders o <-> lineitem
    l — the RewritePredicateSubquery / decorrelation surface."""
    inner = _li_inner_pred(rng)
    corr = "l.l_orderkey = o.o_orderkey"
    kind = rng.randrange(5)
    if kind == 0:
        return f"EXISTS (SELECT 1 FROM lineitem l WHERE {corr} AND {inner})"
    if kind == 1:
        return f"NOT EXISTS (SELECT 1 FROM lineitem l WHERE {corr} AND {inner})"
    if kind == 2:
        # correlated IN: the membership probe itself carries the
        # correlation (non-null inner column, so IN/NOT IN are total)
        neg = "NOT " if rng.random() < 0.4 else ""
        return (
            f"o.o_custkey % 25 {neg}IN "
            f"(SELECT l.l_suppkey % 25 FROM lineitem l WHERE {corr} AND {inner})"
        )
    if kind == 3:
        # correlated COUNT scalar aggregate (always non-null)
        return (
            f"(SELECT COUNT(*) FROM lineitem l WHERE {corr} AND {inner}) "
            f"{rng.choice(_CMP)} {rng.randint(0, 5)}"
        )
    # correlated MAX/MIN scalar aggregate, COALESCE'd over empty groups
    fn = rng.choice(["MAX", "MIN"])
    return (
        f"COALESCE((SELECT {fn}(l.l_linenumber) FROM lineitem l "
        f"WHERE {corr} AND {inner}), 0) {rng.choice(_CMP)} {rng.randint(0, 7)}"
    )


@pytest.mark.parametrize("block", range(2))
def test_random_correlated_subqueries_match_duckdb(spark, block):
    """Correlated-subquery fuzz (round 8, family 20 — VERDICT r7 item 7):
    family 17 covers only uncorrelated scalar subqueries and the curated
    suite's correlated shapes are fixed texts; this family composes random
    correlated EXISTS / NOT EXISTS / IN / NOT IN / scalar-agg predicates
    over orders<->lineitem — including AND/OR DISJUNCTIONS of two
    correlated predicates, the ExistenceJoin rewrite path that plain
    semi/anti-join plans never exercise — and compares full integer
    aggregates on both engines."""
    register_views(spark, SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF_SMOKE}/lineitem.parquet'")
    mismatches = []
    for seed in range(20000 + block * 15, 20000 + block * 15 + 15):
        rng = random.Random(seed)
        parts = [_correlated_pred(rng)]
        if rng.random() < 0.6:  # two correlated predicates, AND/OR composed
            parts.append(_correlated_pred(rng))
        if rng.random() < 0.5:  # mix a plain outer predicate in
            parts.append(f"({_pred(rng, 1)})")
        rng.shuffle(parts)
        glue = rng.choice([" AND ", " OR "])
        sql = (
            "SELECT COUNT(*) AS n, COALESCE(SUM(o_custkey), 0) AS s "
            f"FROM orders o WHERE {glue.join(parts)}"
        )
        try:
            srow = spark.sql(sql).first()
        except Exception as ex:  # noqa: BLE001 — planner rejection is a finding
            mismatches.append((seed, sql, "SPARK ERROR", str(ex)[:120]))
            continue
        drow = con.execute(sql).fetchone()
        if (srow["n"], srow["s"]) != (drow[0], drow[1]):
            mismatches.append((seed, sql, (srow["n"], srow["s"]), tuple(drow)))
    assert not mismatches, mismatches[:3]


# ---------------------------------------------------------------------------
# Family 21 (round 9): random star-schema join + ROLLUP trees — the exact
# shape the verbatim TPC-DS corpus is built from (channel UNION ALL ->
# dim joins -> GROUP BY ROLLUP with SUM(CASE WHEN)), fuzzed over the
# generated star slice so the generator's invariants (FK closure, label
# domains, month_seq anchor) are guarded against future regenerations.
# Integer-only aggregates (COUNT + CAST(SUM(int) AS BIGINT)); one shared
# SQL text on both engines.
# ---------------------------------------------------------------------------
_STAR_CHANNELS = {
    "store": ("store_sales", "ss_sold_date_sk", "ss_item_sk", "ss_customer_sk", "ss_quantity"),
    "catalog": ("catalog_sales", "cs_sold_date_sk", "cs_item_sk", "cs_bill_customer_sk", "cs_quantity"),
    "web": ("web_sales", "ws_sold_date_sk", "ws_item_sk", "ws_bill_customer_sk", "ws_quantity"),
}
_STAR_CATEGORIES = [
    "'Books'", "'Home'", "'Electronics'", "'Jewelry'", "'Men'",
    "'Music'", "'Shoes'", "'Sports'", "'Women'", "'Children'",
]
_STAR_STATES = ["'CA'", "'GA'", "'IL'", "'TX'", "'NY'", "'WA'", "'FL'", "'MI'"]


def _star_fuzz_sql(rng: random.Random) -> str:
    chans = rng.sample(sorted(_STAR_CHANNELS), rng.randint(1, 3))
    branches = [
        f"SELECT '{c}' AS channel, {d} AS date_sk, {i} AS item_sk,"
        f" {cu} AS cust_sk, {q} AS qty FROM {t}"
        for c, (t, d, i, cu, q) in ((c, _STAR_CHANNELS[c]) for c in chans)
    ]
    union = "\nUNION ALL\n".join(branches)

    dims, filters, group_pool = [], [], ["channel"]
    # date_dim always joins (every TPC-DS tree does); random window kind.
    dims.append("JOIN date_dim ON date_sk = d_date_sk")
    k = rng.randrange(3)
    if k == 0:
        filters.append(f"d_year = {rng.randint(1998, 2003)}")
    elif k == 1:
        m = rng.randint(1176, 1236)
        filters.append(f"d_month_seq BETWEEN {m} AND {m} + {rng.randint(0, 11)}")
    else:
        filters.append(f"d_moy = {rng.randint(1, 12)}")
    group_pool.append(rng.choice(["d_year", "d_moy", "d_qoy"]))
    if rng.random() < 0.8:
        dims.append("JOIN item ON item_sk = i_item_sk")
        fk = rng.randrange(3)
        if fk == 0:
            subset = rng.sample(_STAR_CATEGORIES, rng.randint(1, 4))
            filters.append(f"i_category IN ({', '.join(subset)})")
        elif fk == 1:
            filters.append(f"i_manager_id <= {rng.randint(5, 100)}")
        else:
            lo = rng.randint(1, 80)
            filters.append(f"i_current_price BETWEEN {lo} AND {lo + rng.randint(2, 19)}")
        group_pool.append(rng.choice(["i_category", "i_class_id", "i_manager_id"]))
    if rng.random() < 0.5:
        dims.append(
            "JOIN customer ON cust_sk = c_customer_sk "
            "JOIN customer_address ON c_current_addr_sk = ca_address_sk"
        )
        if rng.random() < 0.6:
            subset = rng.sample(_STAR_STATES, rng.randint(1, 4))
            filters.append(f"ca_state IN ({', '.join(subset)})")
        group_pool.append("ca_state")
    gcols = rng.sample(group_pool, rng.randint(1, min(3, len(group_pool))))
    t = rng.randint(5, 40)
    return (
        f"SELECT {', '.join(gcols)}, COUNT(*) AS n,"
        f" CAST(SUM(CASE WHEN qty > {t} THEN qty ELSE 0 END) AS BIGINT) AS sq\n"
        f"FROM ({union}) f\n" + "\n".join(dims) + "\nWHERE " + " AND ".join(filters)
        + f"\nGROUP BY ROLLUP ({', '.join(gcols)})"
    ), " AND ".join(filters), union, "\n".join(dims)


@pytest.mark.parametrize("block", range(2))
def test_random_star_rollup_trees_match_duckdb(spark, block):
    """Family 21: 26 seeds of channel-union -> dim-join -> ROLLUP trees
    over the star slice, full result-set compare. The empty-input ROLLUP
    dialect split (family 19's finding: DuckDB emits the grand-total row,
    Spark returns nothing) is pinned as an asserted invariant instead of
    being dodged."""
    import os

    from spark_cherry_shuffle_service_spark.sources.tpcds_star import (
        register_star_views,
        star_dir,
    )

    register_star_views(spark, SF_SMOKE)
    d = star_dir(SF_SMOKE)
    con = duckdb.connect()
    for t in ("store_sales", "catalog_sales", "web_sales", "date_dim", "item",
              "customer", "customer_address"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(d, t)}.parquet/*.parquet')"
        )
    mismatches, n_empty = [], 0
    for seed in range(21000 + block * 13, 21000 + block * 13 + 13):
        rng = random.Random(seed)
        sql, where, union, joins = _star_fuzz_sql(rng)
        inner_n = con.execute(
            f"SELECT COUNT(*) FROM ({union}) f {joins} WHERE {where}"
        ).fetchone()[0]
        srows = sorted([tuple(r) for r in spark.sql(sql).collect()], key=repr)
        drows = sorted([tuple(r) for r in con.execute(sql).fetchall()], key=repr)
        if inner_n == 0:
            # The documented dialect difference, asserted exactly.
            n_empty += 1
            ok = srows == [] and len(drows) == 1 and drows[0][-2:] == (0, None)
            if not ok:
                mismatches.append((seed, sql, "EMPTY-ROLLUP PIN", srows, drows))
            continue
        if srows != drows:
            mismatches.append((seed, sql, srows[:2], drows[:2]))
    assert not mismatches, mismatches[:2]


@pytest.mark.parametrize("block", range(2))
def test_random_decimal_division_count_mirror_matches_spark(spark, block):
    """Family 22: the exact-division convention itself, fuzzed.

    Round 9 rewrote 30+ verbatim-TPC-DS oracle sites to the HUGEINT
    count form (`operators/tpcds._ratio_counts`), each hand-derived at
    Spark's type-derived result scale. This family generates random
    SUM(decimal)/SUM(decimal) quotients over the star money columns
    (optionally int-literal-scaled numerators and signed profit columns),
    PROBES the live Spark result scale from the DataFrame schema, builds
    the DuckDB mirror at that probed scale, and requires exact value
    equality — so a Spark upgrade that changes decimal-division typing or
    rounding breaks loudly here instead of silently drifting 30 oracles.
    """
    import os

    from spark_cherry_shuffle_service_spark.operators.tpcds import _ratio_counts
    from spark_cherry_shuffle_service_spark.sources.tpcds_star import (
        register_star_views,
        star_dir,
    )

    register_star_views(spark, SF_SMOKE)
    d = star_dir(SF_SMOKE)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW store_sales AS SELECT * FROM read_parquet('{os.path.join(d, 'store_sales')}.parquet/*.parquet')"
    )
    cols = (
        "ss_sales_price", "ss_list_price", "ss_ext_sales_price",
        "ss_ext_discount_amt", "ss_net_paid", "ss_net_profit",  # signed
        "ss_coupon_amt", "ss_wholesale_cost",
    )
    mismatches = []
    for seed in range(22000 + block * 13, 22000 + block * 13 + 13):
        rng = random.Random(seed)
        num_col, den_col = rng.choice(cols), rng.choice(cols)
        mult = rng.choice(("", " * 3", " * 100"))
        modk = rng.choice((3, 5, 7))
        num = f"(SUM({num_col}){mult})"
        den = f"SUM({den_col})"
        key = f"(ss_item_sk % {modk})"
        spark_sql = (
            f"SELECT {key} AS k, {num} / {den} AS q FROM store_sales GROUP BY {key}"
        )
        sdf = spark.sql(spark_sql)
        dtype = sdf.schema["q"].dataType.simpleString()
        assert dtype.startswith("decimal("), (seed, dtype)
        scale = int(dtype.rstrip(")").split(",")[1])
        unit = "0." + "0" * (scale - 1) + "1" if scale else "1"
        duck_sql = (
            f"SELECT {key} AS k, CAST({_ratio_counts(num, den, scale)} AS DECIMAL(38,0))"
            f" * {unit} AS q FROM store_sales GROUP BY {key}"
        )
        srows = sorted([tuple(r) for r in sdf.collect()], key=repr)
        drows = sorted([tuple(r) for r in con.execute(duck_sql).fetchall()], key=repr)
        if len(srows) != len(drows) or any(
            sk != dk or (sq is None) != (dq is None) or (sq is not None and sq != dq)
            for (sk, sq), (dk, dq) in zip(srows, drows)
        ):
            mismatches.append((seed, spark_sql, srows[:2], drows[:2]))
    assert not mismatches, mismatches[:2]


def _agg_window_tree_sql(rng: random.Random, table: str) -> str:
    """Family 23's generator: GROUP-BY aggregate -> window functions OVER
    the aggregate (rank ordered by the exact sum, running-SUM frame,
    partition total) -> a STACKED second window over the first window's
    output — the q47/q51/q57/q67/q89 shape class (windows over
    re-aggregated CTEs). All values are integer cents (CAST(money * 100
    AS BIGINT)), so no float convention is involved; (k1, k2) is the
    GROUP BY key, hence unique per partition, so every ORDER BY below is
    tie-free by construction (the LIMIT/ordering rule)."""
    if table == "store_sales":
        k1 = rng.choice(["COALESCE(ss_store_sk, -1)", "(ss_item_sk % 5)", "(ss_sold_date_sk % 7)"])
        k2 = rng.choice(["(ss_item_sk % 23)", "(ss_ticket_number % 17)", "(ss_sold_date_sk % 13)"])
        v = "CAST(ss_ext_sales_price * 100 AS BIGINT)"
        leaves = [
            f"ss_quantity {rng.choice(_CMP)} {rng.randint(1, 50)}",
            f"ss_item_sk {rng.choice(_CMP)} {rng.randint(1, 2000)}",
            f"ss_sold_date_sk % {rng.randint(2, 9)} = {rng.randint(0, 1)}",
        ]
    else:  # lineitem
        k1 = rng.choice(["l_returnflag", "(l_suppkey % 5)"])
        k2 = rng.choice(["(l_partkey % 23)", "(l_orderkey % 17)"])
        # l_extendedprice is a DOUBLE in the fixtures: FLOOR of the
        # bit-identical double, never a direct double->int CAST (Spark
        # truncates, DuckDB rounds — the q54 divergence class).
        v = "CAST(FLOOR(l_extendedprice * 100) AS BIGINT)"
        leaves = [
            f"l_quantity {rng.choice(_CMP)} {rng.randint(1, 50)}",
            f"l_partkey {rng.choice(_CMP)} {rng.randint(1, 2000)}",
            f"l_orderkey % {rng.randint(2, 9)} = {rng.randint(0, 1)}",
        ]
    rng.shuffle(leaves)
    op = rng.choice(["AND", "OR"])
    pred = f"({leaves[0]}) {op} ({leaves[1]})"
    rank_fn = rng.choice(["RANK()", "DENSE_RANK()", "ROW_NUMBER()"])
    direction = rng.choice(["ASC", "DESC"])
    j, m = rng.randint(1, 6), rng.randint(1, 6)
    frame = rng.choice(
        [
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            f"ROWS BETWEEN {j} PRECEDING AND CURRENT ROW",
            f"ROWS BETWEEN {j} PRECEDING AND {m} FOLLOWING",
        ]
    )
    rank_filter = f"WHERE r <= {rng.randint(2, 10)}" if rng.random() < 0.5 else ""
    return (
        f"WITH agg AS (SELECT k1, k2, SUM(v) AS s, COUNT(*) AS c FROM "
        f"(SELECT {k1} AS k1, {k2} AS k2, {v} AS v FROM {table} WHERE {pred}) "
        f"GROUP BY k1, k2), "
        f"w AS (SELECT k1, k2, s, c, "
        f"{rank_fn} OVER (PARTITION BY k1 ORDER BY s {direction}, k2) AS r, "
        f"SUM(s) OVER (PARTITION BY k1 ORDER BY k2 {frame}) AS run, "
        f"SUM(s) OVER (PARTITION BY k1) AS tot, "
        f"COUNT(*) OVER (PARTITION BY k1) AS nk FROM agg) "
        f"SELECT k1, k2, s, c, r, run, tot, nk, "
        f"ROW_NUMBER() OVER (PARTITION BY k1 ORDER BY run, k2) AS rr "
        f"FROM w {rank_filter}"
    )


@pytest.mark.parametrize("block", range(2))
def test_random_window_trees_over_aggregates_match_duckdb(spark, block):
    """Family 23 (VERDICT r9 item 4): windows were the one §2 family
    without a dedicated tree fuzzer — families 3/9 cover single windows
    over RAW rows, but the verbatim corpus's window sites (q47/q57's
    windowed avg-of-sums, q51's sum(sum()) OVER, q67/q70/q86/q89's
    rank-over-aggregates) all window over RE-AGGREGATED inputs and stack
    windows. 26 seeds over the sf0.001 star's store_sales AND the
    fixture lineitem; full sorted result-set compare."""
    import os

    from spark_cherry_shuffle_service_spark.sources.tpcds_star import (
        register_star_views,
        star_dir,
    )

    register_views(spark, SF_SMOKE)
    register_star_views(spark, SF_SMOKE)
    d = star_dir(SF_SMOKE)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW store_sales AS SELECT * FROM read_parquet('{os.path.join(d, 'store_sales')}.parquet/*.parquet')"
    )
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF_SMOKE}/lineitem.parquet'")
    mismatches = []
    for seed in range(23000 + block * 13, 23000 + block * 13 + 13):
        rng = random.Random(seed)
        table = rng.choice(["store_sales", "lineitem"])
        sql = _agg_window_tree_sql(rng, table)
        srows = sorted([tuple(r) for r in spark.sql(sql).collect()], key=repr)
        drows = sorted([tuple(r) for r in con.execute(sql).fetchall()], key=repr)
        if srows != drows:
            mismatches.append((seed, sql, srows[:2], drows[:2]))
    assert not mismatches, mismatches[:2]
