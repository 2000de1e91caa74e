"""Structured Streaming pipelines (SURVEY §2.8).

The reference is an online record-at-a-time stateful service; its
streaming semantics map to Structured Streaming as:

- St1 incremental ingest with upsert -> file/Kafka source ->
  ``foreachBatch`` applying :func:`operators.ingest.upsert_id_mapping`
  per micro-batch (matched => text-only update; not matched => insert
  with dense ids — exactly main.py:119-134, serialized per batch like
  the reference's single SQLite writer).
- St2 MAX+1 id counter -> the per-batch row_number + running max inside
  the same foreachBatch.
- St3 persistence on shutdown only (main.py:168-173, crash loses the
  index) -> per-micro-batch checkpointing: strictly stronger, noted as
  an intentional semantic upgrade.

[EXT] event-time analytics: watermarked tumbling/sliding/session
windows over the `events` shape — the streaming twins of the batch
queries in queries_events.py (same logical plans + watermark).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cnc_visionsearch_spark.operators.ingest import upsert_id_mapping
from cnc_visionsearch_spark.schemas import EVENTS

__all__ = [
    "read_event_stream",
    "tumbling_counts_stream",
    "sliding_counts_stream",
    "session_window_stream",
    "streaming_upsert_sink",
]


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-source stream of events parquet drops (S4 streaming analog).

    At scale this is a Kafka source; the file source keeps the same
    unbounded-DataFrame semantics and is what tests replay against.
    """
    return (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_counts_stream(
    events: DataFrame, watermark: str = "1 hour", window: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling window counts — late rows beyond the
    watermark are dropped (the [EXT] late-data semantics; the reference
    has no analog)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("ts_hour"), "event_type", "n_events", "sum_value")
    )


def sliding_counts_stream(
    events: DataFrame,
    watermark: str = "1 hour",
    window: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "n_events")
    )


def session_window_stream(
    events: DataFrame, watermark: str = "1 hour", gap: str = "30 minutes"
) -> DataFrame:
    """session_window() — the native streaming form of the batch
    sessionization in queries_events.py (gap-merged state per user)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def streaming_upsert_sink(
    batches: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    spark: SparkSession | None = None,
) -> "Callable":
    """foreachBatch sink reproducing St1/St2: each micro-batch of
    (str_id, text_content) rows is upserted into the id_mapping parquet
    at ``state_dir`` with reference semantics.

    Returns the started StreamingQuery. The parquet state table is
    read-modify-written per batch (the Delta-MERGE fallback; with Delta
    available this becomes MERGE INTO, same semantics, no rewrite).
    """
    sess = spark or batches.sparkSession
    mapping_path = os.path.join(state_dir, "id_mapping")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        s = batch_df.sparkSession
        if os.path.exists(mapping_path):
            current = s.read.parquet(mapping_path)
        else:
            current = s.createDataFrame(
                [], "str_id: string, faiss_id: long, text_content: string"
            )
        # batch may contain the same str_id twice: keep the last row
        # (reference processes records serially; "last write wins")
        dedup = (
            batch_df.groupBy("str_id")
            .agg(F.max_by("text_content", "seq").alias("text_content"))
            if "seq" in batch_df.columns
            else batch_df.dropDuplicates(["str_id"])
        )
        updated = upsert_id_mapping(current, dedup)
        tmp = mapping_path + f".tmp{batch_id}"
        updated.write.mode("overwrite").parquet(tmp)
        final = s.read.parquet(tmp)
        final.write.mode("overwrite").parquet(mapping_path)

    return (
        batches.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
