"""Ingest / catalog / service-parity queries: the reference's write
path (upsert with text-only-update quirk), dense id assignment, and the
/health endpoint analog (SURVEY §2.9, §3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cnc_visionsearch_spark.operators.ingest import next_dense_id, upsert_id_mapping
from cnc_visionsearch_spark.registry import register
from cnc_visionsearch_spark.sources.catalog import derive_id_mapping, load_table

_ID_MAPPING_CTE = """
id_mapping AS (
  SELECT 'img_' || e.vec_id AS str_id, e.vec_id + 1 AS faiss_id, d.text AS text_content
  FROM embeddings e LEFT JOIN documents d ON e.vec_id = d.doc_id
)
"""


@register(
    "next_dense_id",
    oracle=f"""
WITH {_ID_MAPPING_CTE}
SELECT CAST(COALESCE(MAX(faiss_id), 0) + 1 AS BIGINT) AS next_faiss_id FROM id_mapping
""",
    doc="A1: the reference's dense id allocator (main.py:129-130) — "
    "COALESCE(MAX,0)+1, ids from 1.",
)
def next_dense_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = derive_id_mapping(
        load_table(spark, sf_dir, "embeddings"),
        load_table(spark, sf_dir, "documents"),
    )
    return next_dense_id(m)


@register(
    "upsert_batch_semantics",
    oracle=f"""
WITH {_ID_MAPPING_CTE},
batch AS (
  SELECT 'img_' || (doc_id + 5) AS str_id,
         'updated: ' || substr(text, 1, 40) AS text_content
  FROM documents WHERE doc_id >= 490
),
updated AS (
  SELECT m.str_id, m.faiss_id,
         COALESCE(b.text_content, m.text_content) AS text_content
  FROM id_mapping m LEFT JOIN batch b USING (str_id)
),
maxid AS (SELECT COALESCE(MAX(faiss_id), 0) AS mx FROM id_mapping),
inserted AS (
  SELECT b.str_id, mx + row_number() OVER (ORDER BY b.str_id) AS faiss_id,
         b.text_content
  FROM batch b, maxid
  WHERE NOT EXISTS (SELECT 1 FROM id_mapping m WHERE m.str_id = b.str_id)
)
SELECT str_id, CAST(faiss_id AS BIGINT) AS faiss_id, text_content
FROM (SELECT * FROM updated UNION ALL SELECT * FROM inserted)
WHERE faiss_id > 480
""",
    doc="St1/J2/A1: one /add_drawing batch with exact reference semantics "
    "(main.py:119-134) — matched rows get text-only updates (embedding NOT "
    "re-indexed), new rows get dense MAX+1 ids in str_id order.",
)
def upsert_batch_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    mapping = derive_id_mapping(emb, docs)
    batch = docs.filter(F.col("doc_id") >= 490).select(
        F.concat(F.lit("img_"), (F.col("doc_id") + 5).cast("string")).alias("str_id"),
        F.concat(F.lit("updated: "), F.substring("text", 1, 40)).alias("text_content"),
    )
    out = upsert_id_mapping(mapping, batch)
    return out.filter(F.col("faiss_id") > 480)


@register(
    "health_status",
    oracle="""
SELECT
  CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_vectors,
  CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_documents,
  CAST((SELECT count(*) FROM events) AS BIGINT) AS n_events,
  CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_lineitem,
  (SELECT count(*) FROM embeddings) > 0 AS index_ready
""",
    doc="§2.9 GET /health analog (README.md:34,69-73) + the empty-index "
    "guard P4 (main.py:152-153) as a status row.",
)
def health_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("embeddings", "documents", "events", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT
          CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_vectors,
          CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_documents,
          CAST((SELECT count(*) FROM events) AS BIGINT) AS n_events,
          CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_lineitem,
          (SELECT count(*) FROM embeddings) > 0 AS index_ready
        """
    )
