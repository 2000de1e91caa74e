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

__all__ = [
    "next_dense_id",
    "upsert_id_mapping",
    "ID_MAPPING_SCHEMA",
    "tlog_init_id_mapping",
    "tlog_merge_upsert",
]

ID_MAPPING_SCHEMA = "str_id string, faiss_id bigint, text_content string"


def _bucket_expr(n_buckets: int):
    """Merge-key bucket id — a PURE function of str_id (derived, never
    stored), so the log's per-add bucket tags, the merge's touched-set,
    and the conflict domains all agree by construction."""
    return F.pmod(F.xxhash64("str_id"), F.lit(n_buckets)).cast("int")


def tlog_init_id_mapping(tlog, mapping: DataFrame, n_buckets: int = 16) -> int:
    """Version 1 of a transactional id_mapping table: the initial state
    lands bucketed on str_id with the running MAX(faiss_id) recorded in
    commit meta (the known_max manifest seam — later merges assign
    globally dense ids without scanning resident state).

    Refuses a NON-EMPTY log: unlike a build-over (ivf_build's overwrite
    semantics), re-running init against a surviving log would APPEND a
    second full copy of the mapping (duplicate rows) and reset the
    dense-id high-water mark (colliding ids) — a crashed partial setup
    must be wiped and rebuilt, never resumed by a second init. The
    emptiness check is NOT check-then-act: the observed version (0)
    passes to commit as ``base_version``, so a commit landing between
    this read and the init's link attempt trips the meta-rebase
    conflict check — two racing inits serialize, one raises."""
    if tlog.latest_version() != 0:
        raise ValueError(
            f"tlog {tlog.root} already holds "
            f"{tlog.latest_version()} commit(s) — init would append a "
            "duplicate full mapping and reset max_faiss_id; wipe the "
            "table directory to rebuild"
        )
    mx = mapping.agg(
        F.coalesce(F.max("faiss_id"), F.lit(0)).alias("mx")
    ).collect()[0]["mx"]
    adds = tlog.write_data(
        mapping.select("str_id", "faiss_id", "text_content"),
        bucket_expr=_bucket_expr(n_buckets),
    )
    return tlog.commit(
        adds=adds,
        op="append",
        meta={"max_faiss_id": int(mx), "n_buckets": n_buckets},
        base_version=0,
    )


def tlog_merge_upsert(
    tlog, batch: DataFrame, txn: tuple[str, int] | None = None
) -> int:
    """``MERGE INTO id_mapping`` with exact reference semantics
    (text-only update / dense MAX+1 insert — :func:`upsert_id_mapping`)
    as ONE optimistic transaction against a :class:`~cnc_visionsearch_
    spark.sources.tlog.TLog` table; returns the committed version.

    The SQLite row this replaces is main.py:119-134; the scale story:

    - the batch's touched BUCKETS (<= n_buckets, a bounded collect of
      a pure function of str_id) bound everything: only those buckets'
      resident files are read (log-tag pruned), rewritten, removed,
      and declared as conflict domains — concurrent merges over
      disjoint key ranges commit with no recompute and no shared I/O;
    - the dense-id high-water mark rides commit meta, so no merge ever
      scans the full table for MAX(faiss_id);
    - ``txn`` (app id, batch seq) makes at-least-once replays commit
      nothing (the streaming twin's exactly-once story);
    - a :class:`TLogConflictError` means a racing commit touched the
      same buckets — re-run under ``run_transaction`` to recompute
      against the new snapshot (serializable outcome)."""
    from pyspark.storagelevel import StorageLevel

    spark = batch.sparkSession
    snap = tlog.snapshot()
    n_buckets = int(snap.meta["n_buckets"])
    bexpr = _bucket_expr(n_buckets)
    # persist: the batch (bounded — one ingest micro-batch) feeds three
    # actions (touched-bucket collect, n_new count, merged write);
    # without it each action re-reads the batch source. Not a barrier:
    # lost blocks recompute.
    batch = batch.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # NULL sentinel folded into the SAME bounded collect (Spark's
        # xxhash64 hashes a NULL input to the seed value, NOT NULL, so
        # the bucket alone cannot reveal a NULL key): a NULL merge key
        # has no reference analog (main.py:119 keys on str_id) and
        # would silently insert a fresh NULL row every batch (NULL
        # never equi-joins) — reject at the boundary, loudly
        guarded = F.when(
            F.col("str_id").isNull(), F.lit(None).cast("int")
        ).otherwise(bexpr)
        touched_raw = [
            r["_tb"]
            for r in batch.select(guarded.alias("_tb")).distinct().collect()
        ]  # bounded: <= n_buckets rows (+1 NULL sentinel at most)
        if any(b is None for b in touched_raw):
            raise ValueError(
                "tlog_merge_upsert: batch contains NULL str_id rows — "
                "the merge key must be non-null; filter or repair the "
                "source"
            )
        touched = sorted(touched_raw)
        resident = tlog.read(
            spark, snap, buckets=touched, schema=ID_MAPPING_SCHEMA
        )
        known_max = int(snap.meta["max_faiss_id"])
        merged = upsert_id_mapping(resident, batch, known_max=known_max)
        n_new = batch.join(
            resident.select("str_id"), "str_id", "left_anti"
        ).count()
        adds = tlog.write_data(merged, bucket_expr=bexpr)
    finally:
        batch.unpersist()
    # the dense-id counter is read-modify-write shared state: only
    # INSERTING merges carry the meta key, so they serialize against
    # each other (the tlog's same-meta-key conflict rule) while
    # update-only merges on disjoint buckets commit concurrently —
    # exactly the id-range-collision hazard the rule exists for
    return tlog.commit(
        adds=adds,
        removes=snap.files_in(touched),
        read_version=snap.version,
        op="rewrite",
        domains=touched,
        meta={"max_faiss_id": known_max + int(n_new)} if n_new else {},
        txn=txn,
    )


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
