"""Multimodal plumbing: binary columns + Arrow-batched decode stub."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cherry_shuffle_service_spark.operators.multimodal import (
    _decode_stub,
    multimodal_decode,
    with_binary_payload,
)
from spark_cherry_shuffle_service_spark.sources.catalog import table
from tests.conftest import SF_SMOKE


def test_payload_is_binary_and_matches_text_bytes(spark):
    docs = with_binary_payload(table(spark, SF_SMOKE, "documents"))
    assert dict(docs.dtypes)["payload"] == "binary"
    r = docs.select("text", "payload").first()
    assert bytes(r["payload"]) == r["text"].encode("utf-8")


def test_decode_stub_deterministic_and_distributed(spark):
    out = multimodal_decode(spark, SF_SMOKE)
    rows = {r["doc_id"]: r for r in out.collect()}
    docs = {r["doc_id"]: r["text"] for r in table(spark, SF_SMOKE, "documents").collect()}
    assert set(rows) == set(docs)
    # spot-check against the stub applied driver-side
    for doc_id in list(docs)[:10]:
        w, h, c = _decode_stub(docs[doc_id].encode("utf-8"))
        r = rows[doc_id]
        assert (r["width"], r["height"], r["checksum"]) == (w, h, c)
        assert r["n_bytes"] == len(docs[doc_id].encode("utf-8"))


def test_decode_filter_pushes_before_python(spark):
    """Metadata filters must run JVM-side before the Python decode stage:
    filtering on doc_id happens in the scan, not after mapInPandas."""
    docs = with_binary_payload(table(spark, SF_SMOKE, "documents")).select("doc_id", "payload")
    filtered = docs.filter(F.col("doc_id") < 50)
    from spark_cherry_shuffle_service_spark.operators.multimodal import (
        DECODE_SCHEMA,
        decode_batches,
    )

    out = filtered.mapInPandas(decode_batches, DECODE_SCHEMA)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == 50
    # the filter (or pushed scan predicate) must appear below MapInPandas
    assert "MapInPandas" in plan
    below = plan.split("MapInPandas", 1)[1]
    assert "doc_id" in below and ("Filter" in below or "PushedFilters" in below)
