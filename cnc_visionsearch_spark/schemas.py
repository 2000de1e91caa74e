"""Declared schemas (SURVEY §1).

The reference's data model, re-expressed as Spark StructTypes:
- ``EMBEDDINGS``: canonical vector store — the DataFrame analog of the
  FAISS index contents (reference main.py:60-62, 134). Source of truth
  for exact kNN; ANN tiers are derived artifacts.
- ``ID_MAPPING``: the SQLite table created at reference main.py:40-48
  (str_id PRIMARY KEY, faiss_id UNIQUE, text_content).
- ``DOCUMENTS`` / ``EVENTS`` / TPC-H-ish tables: the [EXT] analytics
  surface (FIXTURES.md).

Schemas are always declared, never inferred (the reference also uses
fixed schemas — SQLite DDL + a fixed vector dim D_IMAGE=2048).
"""

from __future__ import annotations

from pyspark.sql import types as T

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), True),
    ]
)

ID_MAPPING = T.StructType(
    [
        T.StructField("str_id", T.StringType(), False),
        T.StructField("faiss_id", T.LongType(), False),
        T.StructField("text_content", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

# Multimodal asset table ([EXT]): opaque binary payload + typed metadata.
# Mirrors the reference's in-flight image bytes (main.py:110) promoted to
# a first-class column, as `spark.read.format("binaryFile")` produces.
MEDIA_ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("length", T.LongType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)

ALL_TABLES = TPCH_TABLES + ("events", "documents", "embeddings")
