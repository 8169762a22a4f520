"""Multimodal column plumbing (north-star extension).

Images/audio/video are opaque `binary` columns + typed metadata. The
container has no codec libraries, so the *decode* step is a clearly-marked
deterministic stub — but the Spark-side plumbing (binary columns, schema,
Arrow-batched mapInPandas, partitioning) is real and tested.

Pattern for 100 TB: binary payloads live in parquet next to metadata;
decode/feature-extract runs as mapInPandas over Arrow batches so each
Python worker touches a bounded batch of blobs; all filtering/joining on
metadata happens JVM-side *before* the expensive decode (predicate
pushdown keeps undecoded blobs unread where possible).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from spark_cherry_shuffle_service_spark.plans.registry import query
from spark_cherry_shuffle_service_spark.sources.catalog import table


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach a binary 'payload' column (fixture has no real blobs: encode
    the text — byte-identical in Spark and the oracle's encode())."""
    return docs.withColumn("payload", F.encode(F.col("text"), "utf-8"))


# ---------------------------------------------------------------------------
# Metadata over binary columns — JVM-side only (no decode).
# ---------------------------------------------------------------------------
@query(
    "multimodal_meta",
    oracle="""
    SELECT source,
           COUNT(*) AS n_blobs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MAX(octet_length(encode(text))) AS max_bytes,
           COUNT(DISTINCT md5(text)) AS n_distinct_payloads
    FROM documents
    GROUP BY source
    """,
    tags=("multimodal", "binary"),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(table(spark, sf_dir, "documents"))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum(F.length(F.col("payload"))).alias("total_bytes"),
        F.max(F.length(F.col("payload"))).alias("max_bytes"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_distinct_payloads"),
    )


# ---------------------------------------------------------------------------
# Decode / feature-extract via Arrow-batched mapInPandas. The "decode" is a
# STUB (no image libs in container): it derives deterministic fake
# dimensions from the bytes. Real deployments swap `_decode_stub` for
# PIL/ffmpeg; the Spark plumbing (schema, batching, partition shape) is
# identical.
# ---------------------------------------------------------------------------
DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", LongType()),
    ]
)


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: (width, height, checksum). Replace with a
    real codec in production; raises nothing so the pipeline shape is
    testable end-to-end."""
    n = len(payload)
    checksum = sum(payload[:64]) + n
    width = 16 + (checksum % 64)
    height = 16 + ((checksum // 64) % 48)
    return width, height, checksum


def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        payloads = pdf["payload"]
        decoded = [_decode_stub(bytes(p)) for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": payloads.map(len).astype("int32"),
                "width": pd.Series([d[0] for d in decoded], dtype="int32"),
                "height": pd.Series([d[1] for d in decoded], dtype="int32"),
                "checksum": pd.Series([d[2] for d in decoded], dtype="int64"),
            }
        )


# The payload is utf-8 of ASCII-only fixture text, so the stub's byte math
# (sum of first 64 bytes + length) is SQL-expressible: the Python decode
# path gets a full DuckDB oracle, not just a rows-only check.
_SQL_CHECKSUM = (
    "list_reduce(list_prepend(0, list_transform("
    "generate_series(1, least(64, length(text))), i -> ord(substr(text, i, 1)))),"
    " (x, y) -> x + y) + length(text)"
)


@query(
    "multimodal_decode",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS INT) AS n_bytes,
           CAST(16 + checksum % 64 AS INT) AS width,
           CAST(16 + (checksum // 64) % 48 AS INT) AS height,
           CAST(checksum AS BIGINT) AS checksum
    FROM (SELECT doc_id, length(text) AS n, {_SQL_CHECKSUM} AS checksum, text FROM documents)
    """,
    tags=("multimodal", "mapInPandas", "stub"),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(table(spark, sf_dir, "documents")).select("doc_id", "payload")
    return docs.mapInPandas(decode_batches, DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# Resize: decode → scale to fit a bounding box. The scale math is real; only
# the pixel transform is stubbed (no image libs). 1 row in → 1 row out.
# ---------------------------------------------------------------------------
RESIZE_BOX = 64  # target bounding box (px)

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("orig_w", IntegerType()),
        StructField("orig_h", IntegerType()),
        StructField("new_w", IntegerType()),
        StructField("new_h", IntegerType()),
    ]
)


def resize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, _ = _decode_stub(bytes(payload))
            scale = min(RESIZE_BOX / w, RESIZE_BOX / h, 1.0)
            rows.append((int(doc_id), w, h, max(1, int(w * scale)), max(1, int(h * scale))))
        yield pd.DataFrame(rows, columns=["doc_id", "orig_w", "orig_h", "new_w", "new_h"]).astype(
            {"doc_id": "int64", "orig_w": "int32", "orig_h": "int32", "new_w": "int32", "new_h": "int32"}
        )


@query(
    "multimodal_resize",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
             CAST(16 + checksum % 64 AS INT) AS orig_w,
             CAST(16 + (checksum // 64) % 48 AS INT) AS orig_h
      FROM (SELECT doc_id, {_SQL_CHECKSUM} AS checksum, text FROM documents)
    )
    SELECT doc_id, orig_w, orig_h,
           CAST(greatest(1, trunc(orig_w * least(64.0 / orig_w, 64.0 / orig_h, 1.0))) AS INT) AS new_w,
           CAST(greatest(1, trunc(orig_h * least(64.0 / orig_w, 64.0 / orig_h, 1.0))) AS INT) AS new_h
    FROM dims
    """,
    tags=("multimodal", "mapInPandas", "resize", "stub"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(table(spark, sf_dir, "documents")).select("doc_id", "payload")
    return docs.mapInPandas(resize_batches, RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Frame sampling: treat the payload as a "video" of 256-byte frames and emit
# every k-th frame — the 1 → N row fan-out shape a real video pipeline needs
# (ffmpeg frame extraction swaps in for `_frame_stub`). Output cardinality
# is data-dependent, which is why this MUST be mapInPandas, not a scalar UDF.
# ---------------------------------------------------------------------------
FRAME_BYTES = 256
FRAME_STRIDE = 4  # keep every 4th frame

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", IntegerType()),
        StructField("frame_checksum", LongType()),
    ]
)


def frame_sample_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_checksum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            n_frames = max(1, (len(b) + FRAME_BYTES - 1) // FRAME_BYTES)
            for idx in range(0, n_frames, FRAME_STRIDE):
                frame = b[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
                out["doc_id"].append(int(doc_id))
                out["frame_idx"].append(idx)
                out["frame_bytes"].append(len(frame))
                out["frame_checksum"].append(sum(frame))
        yield pd.DataFrame(out).astype(
            {"doc_id": "int64", "frame_idx": "int32", "frame_bytes": "int32", "frame_checksum": "int64"}
        )


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH frames AS (
      SELECT doc_id, length(text) AS n,
             unnest(generate_series(0,
               CAST(greatest(1, ceil(length(text) / {FRAME_BYTES}.0)) AS INT) - 1,
               {FRAME_STRIDE})) AS frame_idx,
             text
      FROM documents
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(least({FRAME_BYTES}, n - frame_idx * {FRAME_BYTES}) AS INT) AS frame_bytes,
           CAST(list_reduce(list_prepend(0, list_transform(
                  generate_series(frame_idx * {FRAME_BYTES} + 1,
                                  least(n, (frame_idx + 1) * {FRAME_BYTES})),
                  i -> ord(substr(text, i, 1)))), (x, y) -> x + y) AS BIGINT) AS frame_checksum
    FROM frames
    """,
    tags=("multimodal", "mapInPandas", "video", "stub"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(table(spark, sf_dir, "documents")).select("doc_id", "payload")
    return docs.mapInPandas(frame_sample_batches, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Feature extraction: a fixed-width feature vector per blob (8-bin byte
# histogram — the stub stand-in for an image/audio embedding model), Arrow-
# batched and numpy-vectorized per batch. Completes the decode /
# feature-extract / resize / frame-sample quartet; like the others, the
# stub's byte math is replicated in SQL so the Python path has a full
# oracle. At scale the histogram becomes a model forward pass over the
# same mapInPandas plumbing (bounded batch of blobs per worker).
# ---------------------------------------------------------------------------
FEATURE_BINS = 8

FEATURE_SCHEMA = StructType(
    [StructField("doc_id", LongType())]
    + [StructField(f"h{b}", IntegerType()) for b in range(FEATURE_BINS)]
)


def feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in it:
        rows = []
        for p in pdf["payload"]:
            arr = np.frombuffer(bytes(p), dtype=np.uint8) % FEATURE_BINS
            rows.append(np.bincount(arr, minlength=FEATURE_BINS)[:FEATURE_BINS])
        hist = np.vstack(rows) if rows else np.zeros((0, FEATURE_BINS), dtype=np.int64)
        out = {"doc_id": pdf["doc_id"].astype("int64")}
        for b in range(FEATURE_BINS):
            out[f"h{b}"] = pd.Series(hist[:, b], dtype="int32")
        yield pd.DataFrame(out)


_SQL_BYTES = "list_transform(generate_series(1, length(text)), i -> ord(substr(text, i, 1)))"

_SQL_HIST_COLS = ",\n           ".join(
    f"CAST(len(list_filter(bl, x -> x % {FEATURE_BINS} = {b})) AS INT) AS h{b}"
    for b in range(FEATURE_BINS)
)


@query(
    "multimodal_feature_extract",
    oracle=f"""
    SELECT doc_id,
           {_SQL_HIST_COLS}
    FROM (SELECT doc_id, {_SQL_BYTES} AS bl FROM documents)
    """,
    tags=("multimodal", "mapInPandas", "stub", "features"),
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(table(spark, sf_dir, "documents")).select("doc_id", "payload")
    # Same repartition rationale as the other multimodal ops: spread the
    # Python batches across cores instead of one scan partition.
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    return docs.mapInPandas(feature_batches, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Audio-shaped analysis: treat the payload as 8-bit PCM, slice into
# non-overlapping 64-sample windows, and compute per-window energy
# Σ(x-128)² — then per-blob window count, total/max energy, and a quiet-
# window count (energy < 64·1900 ⇔ RMS below the corpus median). This is the VAD/silence-
# trim front of an audio pipeline in stub form. Deliberately ALL-INTEGER
# math: a float RMS would hash-flake on numpy-pairwise vs sequential
# summation order; integer sums are exact on every engine. Arrow-batched
# mapInPandas, numpy reshape+sum per batch — at scale the window energies
# feed a real VAD model over the same plumbing.
# ---------------------------------------------------------------------------
_AUDIO_WIN = 64
_AUDIO_QUIET = _AUDIO_WIN * 1900  # avg square < 1900 ⇔ RMS < ~43.6

AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_windows", LongType()),
        StructField("total_energy", LongType()),
        StructField("max_energy", LongType()),
        StructField("n_quiet", LongType()),
    ]
)


def audio_energy_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in it:
        out = {"doc_id": [], "n_windows": [], "total_energy": [], "max_energy": [], "n_quiet": []}
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
            n_win = len(arr) // _AUDIO_WIN
            if n_win == 0:
                continue
            windows = (arr[: n_win * _AUDIO_WIN] - 128).reshape(n_win, _AUDIO_WIN)
            energy = (windows * windows).sum(axis=1)
            out["doc_id"].append(int(doc_id))
            out["n_windows"].append(n_win)
            out["total_energy"].append(int(energy.sum()))
            out["max_energy"].append(int(energy.max()))
            out["n_quiet"].append(int((energy < _AUDIO_QUIET).sum()))
        yield pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in out.items()})


@query(
    "multimodal_audio_energy",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, {_SQL_BYTES} AS bl FROM documents
    ), w AS (
      SELECT doc_id, bl,
             unnest(generate_series(0, CAST(floor(len(bl) / {_AUDIO_WIN}) AS INT) - 1)) AS k
      FROM b WHERE len(bl) >= {_AUDIO_WIN}
    ), e AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(bl[k * {_AUDIO_WIN} + 1 : k * {_AUDIO_WIN} + {_AUDIO_WIN}],
                                          x -> (x - 128) * (x - 128))) AS BIGINT) AS energy
      FROM w
    )
    SELECT doc_id,
           COUNT(*) AS n_windows,
           CAST(SUM(energy) AS BIGINT) AS total_energy,
           CAST(MAX(energy) AS BIGINT) AS max_energy,
           CAST(SUM(CASE WHEN energy < {_AUDIO_QUIET} THEN 1 ELSE 0 END) AS BIGINT) AS n_quiet
    FROM e GROUP BY doc_id
    """,
    tags=("multimodal", "mapInPandas", "audio", "stub"),
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(table(spark, sf_dir, "documents")).select("doc_id", "payload")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    return docs.mapInPandas(audio_energy_batches, AUDIO_SCHEMA)
