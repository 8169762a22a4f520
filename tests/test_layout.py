"""Z-order layout: interleave math, locality property, and the actual
file-level data-skipping effect of a z-ordered write."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from spark_cherry_shuffle_service_spark.operators.layout import (
    write_zordered,
    zorder_bucketed,
    zorder_value,
)
from spark_cherry_shuffle_service_spark.sources.catalog import table
from tests.conftest import SF_SMOKE


def test_zorder_value_matches_reference_interleave(spark):
    """Spot-check the Morton interleave against a pure-Python reference."""

    def morton(x, y, bits=8):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [(0, 0), (1, 0), (0, 1), (255, 255), (37, 200), (128, 7)]
    df = spark.createDataFrame(pts, "xb long, yb long").withColumn(
        "z", zorder_value(F.col("xb"), F.col("yb"))
    )
    got = {(r["xb"], r["yb"]): r["z"] for r in df.collect()}
    for x, y in pts:
        assert got[(x, y)] == morton(x, y), (x, y)


def test_zorder_blocks_are_bounded_squares(spark):
    """Every 256-z-value block spans at most a 16x16 rectangle in bucket
    space — the locality property data skipping relies on."""
    z = zorder_bucketed(table(spark, SF_SMOKE, "lineitem"), "l_partkey", "l_suppkey")
    stats = (
        z.groupBy(F.shiftright("zval", 8).alias("zblock"))
        .agg(F.min("xb").alias("x0"), F.max("xb").alias("x1"),
             F.min("yb").alias("y0"), F.max("yb").alias("y1"))
        .collect()
    )
    assert len(stats) > 1
    for r in stats:
        assert r["x1"] - r["x0"] <= 15, r
        assert r["y1"] - r["y0"] <= 15, r


def test_write_zordered_narrows_file_stats_on_both_dims(spark, tmp_path):
    """A z-ordered write must give per-file min/max ranges on BOTH
    dimensions that are a fraction of the global range — vs a hash-
    shuffled write whose every file spans ~the full domain. This is the
    property that lets parquet row-group stats prune on either column."""
    li = table(spark, SF_SMOKE, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")

    zpath = str(tmp_path / "zordered")
    rpath = str(tmp_path / "random")
    # 16 range-files over 16-bit z-space → each file covers a 2^12 z-range,
    # i.e. a 64x64 rectangle in 256x256 bucket space (~0.25 span per dim).
    write_zordered(li, zpath, "l_partkey", "l_suppkey", n_files=16)
    li.repartition(16).write.mode("overwrite").parquet(rpath)

    def avg_span(path, col):
        spans, lo, hi = [], [], []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(
                    [md.schema.column(i).name for i in range(md.num_columns)].index(col)
                ).statistics
                spans.append(st.max - st.min)
                lo.append(st.min)
                hi.append(st.max)
        global_span = max(hi) - min(lo)
        return sum(spans) / len(spans) / max(global_span, 1)

    # z-ordered files each cover a small window of both dims; random files
    # cover essentially the whole domain on both.
    for col in ("l_partkey", "l_suppkey"):
        z_frac = avg_span(zpath, col)
        r_frac = avg_span(rpath, col)
        assert z_frac < 0.45, f"{col}: z-file span fraction {z_frac:.2f}"
        assert r_frac > 0.9, f"{col}: random-file span fraction {r_frac:.2f}"
        assert z_frac < r_frac / 2


def test_zordered_read_prunes_row_groups(spark, tmp_path):
    """End-to-end pruning: a two-sided range filter over the z-ordered copy
    must scan fewer rows than the same filter over the hash-shuffled copy
    (parquet row-group skipping via min/max stats)."""
    li = table(spark, SF_SMOKE, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    zpath = str(tmp_path / "zordered")
    rpath = str(tmp_path / "random")
    # small row groups so sf0.001 yields multiple prunable groups per file
    spark.conf.set("spark.hadoop.parquet.block.size", str(64 * 1024))
    try:
        write_zordered(li, zpath, "l_partkey", "l_suppkey", n_files=8)
        li.repartition(8).write.mode("overwrite").parquet(rpath)
    finally:
        spark.conf.unset("spark.hadoop.parquet.block.size")

    xmax = li.agg(F.max("l_partkey")).first()[0]
    ymax = li.agg(F.max("l_suppkey")).first()[0]
    pred = (F.col("l_partkey") <= int(xmax * 0.25)) & (F.col("l_suppkey") <= int(ymax * 0.25))

    # Assert on the stable proxy for reader skipping: the number of row
    # groups whose min/max stats overlap the predicate window (exactly what
    # the parquet reader's row-group filter evaluates).
    def overlapping_row_groups(path, xcut, ycut):
        n_total = n_hit = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                xs = g.column(names.index("l_partkey")).statistics
                ys = g.column(names.index("l_suppkey")).statistics
                n_total += 1
                if xs.min <= xcut and ys.min <= ycut:
                    n_hit += 1
        return n_hit, n_total

    zh, zt = overlapping_row_groups(zpath, int(xmax * 0.25), int(ymax * 0.25))
    rh, rt = overlapping_row_groups(rpath, int(xmax * 0.25), int(ymax * 0.25))
    # the random layout can prune (almost) nothing; the z layout must skip
    # a majority of row groups for a 25%x25% corner query
    assert rh == rt, "hash-shuffled files should all overlap the corner"
    assert zh < zt, "z-ordered layout skipped no row group"
    assert zh / zt <= 0.5, f"z-layout pruned too little: {zh}/{zt}"
    # correctness: both layouts return identical rows
    zr = sorted(r["l_quantity"] for r in spark.read.parquet(zpath).filter(pred).collect())
    rr = sorted(r["l_quantity"] for r in spark.read.parquet(rpath).filter(pred).collect())
    assert zr == rr and len(zr) > 0


def test_coverage_counts_match_registry():
    """COVERAGE.md's registry-count block is generated (tools/
    gen_coverage_counts.py) and must equal the live registry — the doc
    numbers drifted in three consecutive rounds when hand-maintained
    (VERDICT r10 item 7)."""
    import os
    import re
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from gen_coverage_counts import BEGIN, END, counts

    with open("/root/repo/COVERAGE.md") as fh:
        doc = fh.read()
    m = re.search(re.escape(BEGIN) + r".*?" + re.escape(END), doc, re.S)
    assert m, "COVERAGE.md lost its registry-counts block"
    block = m.group(0)
    doc_nums = [int(x) for x in re.findall(r"\*\*(\d+)\*\*", block)]
    c = counts()
    expect = [
        c["total"], c["sql_oracle"], c["py_oracle_only"], c["both_oracles"],
        c["rows_only"], c["compared"], c["tpcds_verbatim"],
    ]
    assert doc_nums == expect, (
        f"COVERAGE.md counts {doc_nums} != registry {expect} — run "
        "`python tools/gen_coverage_counts.py`"
    )
