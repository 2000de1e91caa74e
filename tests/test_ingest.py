"""Upsert / dense-id semantics pinned to the reference (SURVEY §5.2):
text-only update on duplicate (main.py:123-126), MAX+1 dense ids from 1
(main.py:129-130), never-reused ids.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cnc_visionsearch_spark.operators.ingest import next_dense_id, upsert_id_mapping


def make_mapping(spark, rows):
    return spark.createDataFrame(
        rows, "str_id: string, faiss_id: long, text_content: string"
    )


def test_next_dense_id_empty_table_starts_at_one(spark):
    empty = make_mapping(spark, [])
    assert next_dense_id(empty).first().next_faiss_id == 1


def test_next_dense_id_max_plus_one(spark):
    m = make_mapping(spark, [("a", 1, "x"), ("b", 7, "y")])
    assert next_dense_id(m).first().next_faiss_id == 8


def test_upsert_text_only_update(spark):
    """Matched str_id: text updated, faiss_id untouched (main.py:123-126)."""
    m = make_mapping(spark, [("a", 1, "old-a"), ("b", 2, "old-b")])
    batch = spark.createDataFrame(
        [("a", "new-a")], "str_id: string, text_content: string"
    )
    out = {r.str_id: r for r in upsert_id_mapping(m, batch).collect()}
    assert out["a"].text_content == "new-a"
    assert out["a"].faiss_id == 1
    assert out["b"].text_content == "old-b"
    assert len(out) == 2


def test_upsert_insert_dense_ids(spark):
    m = make_mapping(spark, [("a", 1, "x"), ("b", 5, "y")])
    batch = spark.createDataFrame(
        [("d", "td"), ("c", "tc"), ("a", "ta")],
        "str_id: string, text_content: string",
    )
    out = {r.str_id: r.faiss_id for r in upsert_id_mapping(m, batch).collect()}
    # new ids continue from max=5, assigned in str_id order: c=6, d=7
    assert out == {"a": 1, "b": 5, "c": 6, "d": 7}


def test_upsert_into_empty_mapping(spark):
    m = make_mapping(spark, [])
    batch = spark.createDataFrame(
        [("x", "tx"), ("y", "ty")], "str_id: string, text_content: string"
    )
    out = {r.str_id: r.faiss_id for r in upsert_id_mapping(m, batch).collect()}
    assert out == {"x": 1, "y": 2}  # ids start at 1 (main.py:129-130)


def test_upsert_preserves_unrelated_rows(spark):
    m = make_mapping(spark, [(f"k{i}", i + 1, f"t{i}") for i in range(10)])
    batch = spark.createDataFrame([("k3", "new")], "str_id: string, text_content: string")
    out = upsert_id_mapping(m, batch)
    assert out.count() == 10
    assert out.filter(F.col("text_content") == "new").count() == 1
