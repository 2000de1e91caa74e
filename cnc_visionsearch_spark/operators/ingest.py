"""Ingest / upsert operators (SURVEY §2.8 St1-St2, §2.3 J2, §2.4 A1).

The reference's write path (/add_drawing, main.py:104-135):
1. probe: does str_id exist? (main.py:120-121)
2. matched  -> UPDATE text_content ONLY; the embedding is NOT
   re-indexed (main.py:123-126 — HNSW can't replace; quirk reproduced
   exactly, SURVEY §7e)
3. not matched -> assign dense faiss_id = COALESCE(MAX(faiss_id),0)+1
   (main.py:129-130; ids start at 1, never reused) and INSERT.

Spark re-expression: set-based MERGE semantics — one left join for the
update branch, one anti join + window row_number for dense id
assignment. For a batch of new rows the reference's serial MAX+1 loop
is exactly `max_existing + row_number() over (order by str_id)`:
deterministic, dense, gap-free. At scale this runs inside a
foreachBatch (streaming/pipelines.py) or a Delta MERGE where
available; the single-partition window over the *batch* (not the
corpus) is cheap because batches are bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["next_dense_id", "upsert_id_mapping"]


def next_dense_id(id_mapping: DataFrame, id_col: str = "faiss_id") -> DataFrame:
    """A1: COALESCE(MAX(faiss_id), 0) + 1 (reference main.py:129-130)."""
    return id_mapping.agg(
        (F.coalesce(F.max(id_col), F.lit(0)) + 1).cast("bigint").alias("next_faiss_id")
    )


def upsert_id_mapping(
    id_mapping: DataFrame, batch: DataFrame, known_max: int | None = None
) -> DataFrame:
    """Apply one ingest batch with exact reference semantics.

    ``batch`` has (str_id, text_content). Returns the post-upsert
    mapping table:
    - existing str_id: text_content replaced, faiss_id unchanged
      (text-only update, main.py:123-126)
    - new str_id: dense ids continuing from the current max, assigned
      in str_id order (main.py:129-131 batch-serialized)

    ``known_max`` short-circuits the MAX(faiss_id) aggregation when the
    caller already tracks the global max (the incremental streaming
    sink stores it in its manifest so an upsert over a SUBSET of the
    table — only the buckets the batch touches — still assigns globally
    dense ids without scanning the full state).
    """
    b = F.broadcast(
        batch.select(
            F.col("str_id"), F.col("text_content").alias("__new_text")
        )
    )
    updated = (
        id_mapping.join(b, "str_id", "left")
        .select(
            "str_id",
            "faiss_id",
            F.coalesce(F.col("__new_text"), F.col("text_content")).alias(
                "text_content"
            ),
        )
    )
    w = Window.orderBy("str_id")
    new_rows = batch.join(id_mapping.select("str_id"), "str_id", "left_anti")
    if known_max is None:
        max_id = id_mapping.agg(
            F.coalesce(F.max("faiss_id"), F.lit(0)).alias("mx")
        )
        new_rows = new_rows.crossJoin(F.broadcast(max_id))
        base = F.col("mx")
    else:
        base = F.lit(int(known_max))
    inserted = new_rows.select(
        "str_id",
        (base + F.row_number().over(w)).cast("bigint").alias("faiss_id"),
        "text_content",
    )
    return updated.unionByName(inserted)
