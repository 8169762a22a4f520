"""Distributed global ranking / cumulative windows (no single reducer).

A ``Window.orderBy(...)`` with no partition spec funnels the whole frame
through ONE task — Spark itself prints ``WindowExec: No Partition
Defined ... serious performance degradation`` when such a plan runs. At
the per-customer / per-part grain that still scales linearly with SF, so
at 100 TB it is a real bottleneck (VERDICT r5 "what's wrong" #1).

This module implements the classic two-pass distributed ranking
decomposition, DataFrame-only:

1. collect ~``samples_per_bucket × num_buckets`` rows of the sort key
   once (deterministic md5-top-k sample — TakeOrderedAndProject, so the
   driver never holds more than the bounded sample regardless of SF),
   and freeze ≤ num_buckets-1 equally spaced boundary tuples as plan
   LITERALS;
2. assign each row a bucket id by comparing its key against the frozen
   boundaries (a pure row-value function — ≤31 lexicographic compares
   inside whole-stage codegen);
3. aggregate per-bucket row counts (and optional exact per-bucket sums);
4. turn counts into *prefix offsets* with a broadcast triangular
   self-join over the tiny counts frame (≤ num_buckets² pairs at ANY
   data scale — deliberately NOT a window, which would itself be
   partition-less);
5. broadcast the offsets back and add per-bucket ``row_number`` /
   running sums: ``global_rank = offset + local_rank``.

Why boundaries-as-literals instead of ``repartitionByRange`` +
``spark_partition_id()``: the partition-id variant assigns bucket ids in
TWO plan branches (counts and output) and silently corrupts every rank
whenever the exchange is not reused between them — range boundaries are
re-SAMPLED per computation and shuffle-output row order is
nondeterministic, so the branches disagree (observed: chained calls in
orders_rfm produced a different wrong answer on every run). A frozen
boundary list makes bucket id a deterministic function of row VALUES:
no cross-branch coupling exists to break, and the whole query is
reproducible run-to-run. Correctness never depends on where the sampled
boundaries fall — any monotone split yields the same offset + local-rank
arithmetic — only bucket balance does, and the sample bounds the error.

For a TOTAL order (callers must include a unique tiebreak column) this
computes the IDENTICAL global rank as ``ROW_NUMBER() OVER (ORDER BY
...)``, so DuckDB oracles keep matching bit-for-bit. Running sums are
only offered over exact types (BIGINT / DECIMAL) — callers must not
pass raw doubles, whose per-bucket partial sums would be
order-dependent. Sort-key columns must be non-null (all call sites rank
aggregate grains, where keys are grouped-by values or counts).

NTILE derives from the global rank arithmetically (``ntile_expr``), so
the three former global-NTILE queries (orders_rfm,
customer_revenue_deciles) and the global-cumulative one
(abc_classification) route through here with unchanged oracle output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

OrderSpec = tuple[str, str]  # (column name, "asc" | "desc")


def _sort_exprs(order: list[OrderSpec]) -> list[Column]:
    return [F.col(c).desc() if d == "desc" else F.col(c).asc() for c, d in order]


def _row_lt_boundary(order: list[OrderSpec], b: tuple) -> Column:
    """row <(lex, per-direction) boundary, built inside-out."""
    cond = F.lit(False)
    for (name, d), bv in zip(reversed(order), reversed(b)):
        col, lit = F.col(name), F.lit(bv)
        strict = col > lit if d == "desc" else col < lit
        cond = strict | ((col == lit) & cond)
    return cond


def _collect_boundaries(
    df: DataFrame, order: list[OrderSpec], num_buckets: int, samples_per_bucket: int
) -> list[tuple]:
    """Deterministic bounded sample of the sort key → ≤ num_buckets-1
    equally spaced, deduplicated boundary tuples.

    md5 over the key tuple is the tie-free "random" order, so the sample
    is a uniform, run-to-run-stable subset; the limit lowers to
    per-partition top-k (TakeOrderedAndProject) — no global sort, and
    driver memory is bounded by the sample size at any SF.
    """
    names = [c for c, _ in order]
    tag = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in names]))
    sample = (
        df.select(*names, tag.alias("_smp"))
        .orderBy("_smp")
        .limit(num_buckets * samples_per_bucket)
        .collect()
    )
    keyed = [tuple(r[c] for c in names) for r in sample]
    for (name, d), idx in zip(reversed(order), reversed(range(len(order)))):
        keyed.sort(key=lambda t, i=idx: t[i], reverse=(d == "desc"))
    m = len(keyed)
    picks = [keyed[m * i // num_buckets] for i in range(1, num_buckets) if m * i // num_buckets < m]
    out: list[tuple] = []
    for p in picks:
        if not out or p != out[-1]:
            out.append(p)
    return out


def with_global_rank(
    df: DataFrame,
    order: list[OrderSpec],
    rank_name: str | None = "g_rank",
    running: tuple[tuple[str, str], ...] = (),
    n_name: str | None = None,
    num_buckets: int | None = None,
    samples_per_bucket: int = 200,
) -> DataFrame:
    """Add a global 1-based row_number over ``order`` without a
    partition-less window.

    order        [(column_name, "asc"|"desc"), ...]; MUST form a total
                 order (include a unique tiebreak column) over non-null
                 keys.
    rank_name    output column for the global rank (None to skip).
    running      ((src_col, out_col), ...) exact-typed columns to give
                 inclusive global running sums.
    n_name       if set, also emit the total row count under this name
                 (needed by ntile_expr).
    """
    spark = df.sparkSession
    n_buck = num_buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    bounds = _collect_boundaries(df, order, n_buck, samples_per_bucket)

    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (~_row_lt_boundary(order, b)).cast("int")
    bucketed = df.withColumn("_gw_b", bucket)

    aggs = [F.count(F.lit(1)).alias("_gw_bn")]
    aggs += [F.sum(src).alias(f"_gw_bs_{out}") for src, out in running]
    counts = bucketed.groupBy("_gw_b").agg(*aggs)

    # Prefix offsets over the tiny counts frame: triangular broadcast
    # self-join (≤ num_buckets² pairs — SF-invariant), not a window.
    lower = counts.select(
        F.col("_gw_b").alias("_lo_b"),
        F.col("_gw_bn").alias("_lo_n"),
        *[F.col(f"_gw_bs_{out}").alias(f"_lo_s_{out}") for _, out in running],
    )
    tri = counts.join(F.broadcast(lower), F.col("_lo_b") < F.col("_gw_b"), "left")
    off_aggs = [F.coalesce(F.sum("_lo_n"), F.lit(0)).alias("_gw_off")]
    off_aggs += [F.sum(f"_lo_s_{out}").alias(f"_gw_off_{out}") for _, out in running]
    offsets = tri.groupBy("_gw_b").agg(*off_aggs)

    out = bucketed.join(F.broadcast(offsets), "_gw_b")
    sort_cols = _sort_exprs(order)
    w_rank = Window.partitionBy("_gw_b").orderBy(*sort_cols)
    w_run = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    if rank_name is not None:
        out = out.withColumn(
            rank_name, (F.col("_gw_off") + F.row_number().over(w_rank)).cast("bigint")
        )
    for src, out_name in running:
        local = F.sum(src).over(w_run)
        out = out.withColumn(
            out_name,
            F.when(F.col(f"_gw_off_{out_name}").isNull(), local).otherwise(
                F.col(f"_gw_off_{out_name}") + local
            ),
        )
    if n_name is not None:
        total = counts.agg(F.sum("_gw_bn").alias(n_name))
        out = out.join(F.broadcast(total))
    drop = ["_gw_b", "_gw_off"] + [f"_gw_off_{out_name}" for _, out_name in running]
    return out.drop(*drop)


def ntile_expr(rank: str, n: str, k: int) -> Column:
    """SQL-standard NTILE(k) from a 1-based global rank and total count.

    With q = n DIV k and r = n % k, the first r tiles hold q+1 rows and
    the rest hold q — identical to Spark's and DuckDB's NTILE. All
    operands are non-negative so DIV truncation == floor in both
    engines (CLAUDE.md sign-split rule not needed). The q == 0 branch
    (n < k) never reaches the ELSE arm: r = n makes cut = n ≥ rank.
    """
    q = f"({n} DIV {k})"
    r = f"({n} % {k})"
    cut = f"({r} * ({q} + 1))"
    return F.expr(
        f"CAST(CASE WHEN {rank} <= {cut} THEN ({rank} - 1) DIV ({q} + 1) + 1 "
        f"ELSE {r} + ({rank} - {cut} - 1) DIV {q} + 1 END AS INT)"
    )
