"""Service-parity facade tests (SURVEY §2.9): the four README endpoints
as batch callables — health shape, search_drawing lifecycle,
search_by_text over the derived text index.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cnc_visionsearch_spark.service import (
    embed_text_query,
    health,
    search_by_text,
    search_drawing,
)
from cnc_visionsearch_spark.sources.catalog import load_table


def test_health_row(spark, sf_dir):
    row = health(spark, sf_dir).first()
    assert row.index_ready is True
    assert row.n_vectors > 0 and row.n_documents > 0


def test_search_drawing_self_match(spark, sf_dir):
    raw = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 2)
        .first()
        .embedding
    )
    rows = search_drawing(spark, sf_dir, list(raw), top_k=5).collect()
    assert len(rows) == 5
    assert rows[0].str_id == "img_2" and rows[0].distance == 0.0
    dists = [r.distance for r in rows]
    assert dists == sorted(dists)


def test_search_by_text_self_match(spark, sf_dir):
    qtext = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == 3)
        .first()
        .text
    )
    rows = search_by_text(spark, sf_dir, qtext, top_k=5).collect()
    assert rows[0].str_id == "doc_3" and rows[0].distance == 0.0


def test_text_query_embedding_unit_norm(spark):
    v = embed_text_query("a drawing of a cat")
    assert abs(sum(x * x for x in v) - 1.0) < 1e-12
