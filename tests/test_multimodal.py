"""Multimodal plumbing tests: binary payload column through
mapInPandas / pandas_udf — schemas, batch shapes, determinism, and the
invariants the fakes guarantee (real codecs swap in without changing
any of this).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from cnc_visionsearch_spark.operators.multimodal import (
    attach_payload,
    fake_image_embedding,
    frame_samples,
    media_metadata,
    ocr_text,
)
from cnc_visionsearch_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _media(spark, n=20):
    d = load_table(spark, SF, "documents").filter(F.col("doc_id") < n)
    return attach_payload(d).select("doc_id", "text", "payload")


def test_payload_is_utf8_bytes(spark):
    row = _media(spark).first()
    assert bytes(row.payload) == row.text.encode("utf-8")


def test_media_metadata_schema_and_checksum(spark):
    media = _media(spark).select("doc_id", "payload")
    meta = media_metadata(media)
    assert [f.name for f in meta.schema] == [
        "doc_id", "n_bytes", "content_md5", "width", "height",
    ]
    rows = meta.collect()
    src = {r.doc_id: r.text for r in _media(spark).collect()}
    for r in rows:
        raw = src[r.doc_id].encode("utf-8")
        assert r.n_bytes == len(raw)
        assert r.content_md5 == hashlib.md5(raw).hexdigest()
        assert 64 <= r.width < 256 and 64 <= r.height < 256


def test_ocr_roundtrip_exact(spark):
    media = _media(spark)
    out = media.withColumn("ocr", ocr_text("payload"))
    assert out.filter(F.col("ocr") != F.col("text")).count() == 0


def test_fake_embedding_dim_range_determinism(spark):
    media = _media(spark).select("doc_id", "payload")
    e1 = media.withColumn("emb", fake_image_embedding(8)("payload")).collect()
    e2 = media.withColumn("emb", fake_image_embedding(8)("payload")).collect()
    assert {r.doc_id: r.emb for r in e1} == {r.doc_id: r.emb for r in e2}
    for r in e1:
        assert len(r.emb) == 8
        assert all(-1.0 <= x < 1.0 for x in r.emb)


def test_frame_samples_cover_payload(spark):
    media = _media(spark).select("doc_id", "payload")
    frames = frame_samples(media, n_frames=4)
    sizes = {
        r.doc_id: r.total
        for r in frames.groupBy("doc_id")
        .agg(F.sum("frame_bytes").alias("total"))
        .collect()
    }
    for r in media.collect():
        assert sizes[r.doc_id] == len(bytes(r.payload))
    per_doc = frames.groupBy("doc_id").count().agg(F.max("count")).first()[0]
    assert per_doc <= 4
