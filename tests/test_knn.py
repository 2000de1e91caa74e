"""Exact kNN operator semantics vs a numpy oracle (SURVEY §5.1) plus
the reference-quirk semantics tests (§5.2): ascending order, top_k
default, inner-join drop of unmapped ids, empty-corpus guard.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cnc_visionsearch_spark.operators.knn import (
    attach_metadata,
    knn_join,
    knn_single,
    with_normalized,
)
from cnc_visionsearch_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return with_normalized(load_table(spark, sf_dir, "embeddings")).cache()


@pytest.fixture(scope="module")
def emb_np(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


def numpy_topk(ids, mat, q, k):
    q = np.asarray(q, dtype=np.float64)
    q = q / np.linalg.norm(q)
    d = ((mat - q) ** 2).sum(axis=1)
    order = np.lexsort((ids, d))[:k]
    return [(int(ids[i]), float(d[i])) for i in order]


def test_knn_single_matches_numpy(spark, sf_dir, emb, emb_np):
    ids, mat = emb_np
    qvec = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 3)
        .first()
        .embedding
    )
    got = [(r.vec_id, r.distance) for r in knn_single(emb, qvec, k=10).collect()]
    want = numpy_topk(ids, mat, [float(x) for x in qvec], 10)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_knn_single_ascending_and_k(emb):
    """main.py:139 top_k default 10; main.py:158 ascending order."""
    q = emb.first().embedding
    rows = knn_single(emb, q, k=5).collect()
    assert len(rows) == 5
    dists = [r.distance for r in rows]
    assert dists == sorted(dists)
    assert dists[0] == pytest.approx(0.0, abs=1e-12)  # self-match first


def test_knn_returns_fewer_when_corpus_small(spark):
    """FAISS pads with -1 (filtered at main.py:159); Spark simply
    returns < k rows."""
    small = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id: long, embedding: array<double>"
    )
    small = with_normalized(small)
    assert knn_single(small, [1.0, 0.0], k=10).count() == 2


def test_knn_empty_corpus_guard(spark):
    """main.py:152-153: empty index -> no results (vs error)."""
    empty = spark.createDataFrame([], "vec_id: long, embedding: array<double>")
    empty = with_normalized(empty)
    assert knn_single(empty, [1.0, 0.0], k=10).count() == 0


def test_knn_topk_monotone_in_k(emb):
    """Property: top-k is a prefix of top-(k+5)."""
    q = emb.filter(F.col("vec_id") == 7).first().embedding
    small = [r.vec_id for r in knn_single(emb, q, k=5).collect()]
    big = [r.vec_id for r in knn_single(emb, q, k=10).collect()]
    assert big[:5] == small


def test_knn_join_matches_per_query_single(spark, emb, emb_np):
    ids, mat = emb_np
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "nvec"
    )
    got = knn_join(queries, emb, k=4).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r.vec_id)
    for qid, neighbor_ids in by_q.items():
        qvec = mat[list(ids).index(qid)]
        want = [w[0] for w in numpy_topk(ids, mat, qvec, 4)]
        assert neighbor_ids == want


def test_attach_metadata_inner_drop(spark):
    """main.py:161-163: hits with no mapping row are silently dropped."""
    hits = spark.createDataFrame(
        [(1, 0.1), (2, 0.2), (99, 0.3)], "vec_id: long, distance: double"
    )
    mapping = spark.createDataFrame(
        [("a", 1), ("b", 2)], "str_id: string, faiss_id: long"
    )
    out = attach_metadata(hits, mapping).collect()
    assert sorted(r.str_id for r in out) == ["a", "b"]


def test_knn_join_chunked_equals_unchunked(spark):
    """Chunked-broadcast kNN join must return exactly the unchunked
    result (chunking only partitions the query side)."""
    from cnc_visionsearch_spark.operators.knn import (
        knn_join,
        knn_join_chunked,
        with_normalized,
    )
    from cnc_visionsearch_spark.sources.catalog import load_table

    emb = with_normalized(load_table(spark, "/root/testdata/sf0.01", "embeddings"))
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("nvec")
    )
    plain = {
        (r.query_id, r.rank): r.vec_id
        for r in knn_join(queries, emb, k=3).collect()
    }
    chunked = {
        (r.query_id, r.rank): r.vec_id
        for r in knn_join_chunked(queries, emb, k=3, chunk_rows=7).collect()
    }
    assert chunked == plain and len(plain) == 20 * 3
    # explicit n_chunks (the no-sizing-job path) gives the same result
    explicit = {
        (r.query_id, r.rank): r.vec_id
        for r in knn_join_chunked(queries, emb, k=3, n_chunks=3).collect()
    }
    assert explicit == plain


def test_knn_zero_query_vector_nan_quirk(emb):
    """A zero query vector must produce NaN distances as a RESULT (the
    reference's numpy x/0.0 at main.py:87), never an exception."""
    import math

    rows = knn_single(emb, [0.0, 0.0] + [0.0] * 62, k=5).collect()
    assert len(rows) == 5
    assert all(math.isnan(r.distance) for r in rows)
