"""Source / sink formats beyond parquet (SURVEY §2.1 S4/S6).

The reference ingests record-at-a-time multipart bytes (main.py:110)
and emits JSON responses (main.py:135,165). Batch-side equivalents,
each with DECLARED schemas (never inferred — schema inference is a
full extra pass at 100 TB and nondeterministic under dirty data):

- JSON lines read/write (the response-sink analog, S6)
- CSV read/write with explicit schema + mode=FAILFAST (corrupt rows
  surface instead of silently nulling)
- binaryFile directory reader (S4: the batch analog of multipart image
  upload — one row per file with path/length/content)

All readers return plain DataFrames; every downstream operator is
format-agnostic by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "read_jsonl",
    "write_jsonl",
    "read_csv",
    "write_csv",
    "read_binary_dir",
    "read_orc",
    "write_orc",
    "compact_layout",
]


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """JSON-lines source with declared schema; FAILFAST so malformed
    rows raise instead of becoming silent nulls."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S6: the JSON response sink, batch form."""
    df.write.mode(mode).json(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_binary_dir(
    spark: SparkSession, path: str, glob: str = "*"
) -> DataFrame:
    """S4 batch analog of the multipart image source: one row per file
    with (path, modificationTime, length, content BINARY) — feeds the
    multimodal operators (operators/multimodal.py) directly."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (columnar alternative to parquet — common in
    Hive-lineage lakes). Same vectorized reader + predicate-pushdown /
    column-pruning story as parquet; schema comes from the file footer
    (self-describing, not inferred)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink; optional hive-style partitioning for partition-pruned
    reads (same layout contract as the parquet/ANN-cell writers)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def compact_layout(
    spark: SparkSession,
    path: str,
    partition_by: list[str] | None = None,
    target_rows_per_file: int = 1_000_000,
    fmt: str = "parquet",
) -> None:
    """Small-file compaction for append-heavy layouts (streaming sinks
    accrete one file per micro-batch per partition — at 100 TB that is
    metadata death for every later scan).

    Rewrites the layout with files sized by ``target_rows_per_file``:
    read -> repartition -> write to a sibling tmp dir -> swap (Spark
    cannot overwrite a path it is lazily reading). Partitioned layouts
    keep their partitioning (PartitionFilters pruning survives), and
    rows are repartitioned BY the partition columns so each hive
    partition is written by few tasks (a bare ``repartition(n)`` +
    ``partitionBy`` would emit up to n files per partition again).

    Swap order: old -> ``.bak``, tmp -> live, drop ``.bak``. Entry
    first self-heals any earlier crash: a ``.bak`` with no live path
    (death between the two renames) is restored; a leftover ``.bak``
    or ``.tmp`` beside a live path (death before/after the swap
    completed) is discarded — so every crash window leaves a state the
    next call recovers from without manual surgery. Run from the
    maintenance schedule, not the ingest path. At cluster scale pass a
    partition subtree as ``path`` to bound the rewrite unit (or swap
    to an Iceberg/Delta rewrite-files action, which makes the commit
    atomic).
    """
    import shutil

    live = path.rstrip("/")
    tmp = live + ".compact_tmp"
    bak = live + ".compact_bak"
    # crash recovery from a previous invocation
    if os.path.exists(bak) and not os.path.exists(live):
        os.rename(bak, live)  # died mid-swap: restore the old layout
    for leftover in (tmp, bak):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)

    reader = getattr(spark.read, fmt)
    df = reader(live)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))  # ceil
    if partition_by:
        df = df.repartition(n_files, *[F.col(c) for c in partition_by])
    else:
        df = df.repartition(n_files)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    getattr(writer, fmt)(tmp)
    os.rename(live, bak)
    os.rename(tmp, live)
    shutil.rmtree(bak)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a BUCKETED catalog table — the pre-shuffled
    layout that makes repeated big-table joins free at 100 TB: two
    tables bucketed (and sorted) on the same key with the same bucket
    count join with ZERO Exchange — the shuffle was paid once at write
    time and amortizes over every later join/aggregate on that key
    (tests/test_plans.py pins the exchange-free SortMergeJoin). This is
    Spark's table-format analog of the cell-partitioned ANN layouts:
    co-locate ONCE, probe forever. Bucket pruning additionally turns
    equality predicates on the bucket key into file skipping.

    Uses the session catalog (Parquet + bucket metadata); on a real
    deployment the same call targets the lakehouse metastore. sort=True
    adds sortBy(bucket_cols) so merge joins skip the per-partition
    Sort when bucket-sorted reads apply.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)
