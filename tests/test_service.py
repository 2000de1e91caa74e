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


def test_search_by_text_lexical_matches_registered_probe(spark, sf_dir):
    """The lexical service facade is the same ranked path the
    registered text_inverted_bm25_topk gate pins — same query terms in
    any order, same top-10."""
    from cnc_visionsearch_spark.queries_analytics import (
        _BM25_IDX_TERMS,
        text_inverted_bm25_topk,
    )
    from cnc_visionsearch_spark.service import search_by_text_lexical

    via_service = search_by_text_lexical(
        spark, sf_dir, " ".join(reversed(_BM25_IDX_TERMS)), top_k=10
    ).collect()
    via_query = text_inverted_bm25_topk(spark, sf_dir).collect()
    assert [tuple(r) for r in via_service] == [tuple(r) for r in via_query]
    assert via_service
