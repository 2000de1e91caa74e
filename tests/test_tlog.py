"""sources/tlog.py — the optimistic-concurrency transaction log: the
ACID properties the SCALE.md table-format stance names as the gap the
tmp+rename protocol leaves open (conflict detection between different
mutations of one artifact, snapshot isolation, time travel), plus the
transactional MERGE (operators/ingest.tlog_merge_upsert) that gives
the reference's id_mapping upserts (main.py:119-134) a concurrent-
writer story."""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from cnc_visionsearch_spark.operators.ingest import (
    ID_MAPPING_SCHEMA,
    tlog_init_id_mapping,
    tlog_merge_upsert,
    upsert_id_mapping,
)
from cnc_visionsearch_spark.sources.catalog import (
    derive_id_mapping,
    load_table,
)
from cnc_visionsearch_spark.sources.tlog import (
    CHECKPOINT_EVERY,
    TLog,
    TLogConflictError,
    run_transaction,
)

SF = "/root/testdata/sf0.001"


def _mk_batch(spark, rows):
    return spark.createDataFrame(
        rows, "str_id string, text_content string"
    )


@pytest.fixture()
def mapping(spark):
    emb = load_table(spark, SF, "embeddings")
    docs = load_table(spark, SF, "documents")
    return derive_id_mapping(emb, docs)


def test_append_commits_race_to_distinct_versions(spark, tmp_path):
    """Version claims are atomic: many threads blind-appending
    concurrently each win a DISTINCT version and every file survives
    into the final snapshot (the create-exclusive race is the
    arbiter, no external lock)."""
    t = TLog(str(tmp_path / "t"))
    df = spark.range(3).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("str_id"),
        F.col("id").alias("faiss_id"),
        F.lit("x").alias("text_content"),
    )
    versions, errs = [], []

    def one():
        try:
            adds = t.write_data(df)
            versions.append(t.commit(adds=adds, op="append"))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=one) for _ in range(6)]
    [th.start() for th in threads]
    [th.join() for th in threads]
    assert not errs
    assert sorted(versions) == [1, 2, 3, 4, 5, 6]
    snap = t.snapshot()
    assert snap.version == 6 and len(snap.files) == 6
    assert t.read(spark, schema=ID_MAPPING_SCHEMA).count() == 18


def test_snapshot_isolation_and_time_travel(spark, tmp_path):
    """A version, once committed, reads the same forever: later
    commits never change what version N contains."""
    t = TLog(str(tmp_path / "t"))
    a = _mk_batch(spark, [("a", "1")]).withColumn(
        "faiss_id", F.lit(1).cast("bigint")
    )
    b = _mk_batch(spark, [("b", "2")]).withColumn(
        "faiss_id", F.lit(2).cast("bigint")
    )
    v1 = t.commit(adds=t.write_data(a), op="append")
    before = {
        r.str_id for r in t.read(spark, v1, schema=ID_MAPPING_SCHEMA).collect()
    }
    t.commit(adds=t.write_data(b), op="append")
    after_v1 = {
        r.str_id for r in t.read(spark, v1, schema=ID_MAPPING_SCHEMA).collect()
    }
    assert before == after_v1 == {"a"}
    assert {
        r.str_id for r in t.read(spark, schema=ID_MAPPING_SCHEMA).collect()
    } == {"a", "b"}
    with pytest.raises(ValueError, match="no version"):
        t.snapshot(99)


def test_rewrite_conflicts_on_overlapping_domains(spark, tmp_path, mapping):
    """Two merges racing over the SAME bucket: the loser's commit
    raises TLogConflictError instead of silently basing its rewrite on
    a stale snapshot — the exact failure the tmp+rename protocol
    cannot detect. run_transaction then recomputes and the final state
    equals the two merges applied serially."""
    t = TLog(str(tmp_path / "t"))
    tlog_init_id_mapping(t, mapping, n_buckets=4)
    snap0 = t.snapshot()

    b1 = _mk_batch(spark, [("img_3", "one")])
    b2 = _mk_batch(spark, [("img_3", "two"), ("zz_new", "fresh")])

    # manual interleave: both compute against snap0, first commit wins
    tlog_merge_upsert(t, b1)
    # replaying b2's merge against the STALE snapshot must conflict:
    # simulate by re-running merge whose read_version is snap0's
    from cnc_visionsearch_spark.operators.ingest import _bucket_expr

    bexpr = _bucket_expr(4)
    touched = sorted(
        r["_tb"] for r in b2.select(bexpr.alias("_tb")).distinct().collect()
    )
    resident = t.read(spark, snap0, buckets=touched, schema=ID_MAPPING_SCHEMA)
    merged = upsert_id_mapping(
        resident, b2, known_max=int(snap0.meta["max_faiss_id"])
    )
    adds = t.write_data(merged, bucket_expr=bexpr)
    with pytest.raises(TLogConflictError):
        t.commit(
            adds=adds,
            removes=snap0.files_in(touched),
            read_version=snap0.version,
            op="rewrite",
            domains=touched,
            meta={"max_faiss_id": int(snap0.meta["max_faiss_id"]) + 1},
        )
    # the optimistic loop converges to the serial outcome
    run_transaction(lambda: tlog_merge_upsert(t, b2))
    final = t.read(spark, schema=ID_MAPPING_SCHEMA)
    row = final.filter(F.col("str_id") == "img_3").collect()[0]
    assert row.text_content == "two"  # b2 applied after b1
    mx = int(t.snapshot().meta["max_faiss_id"])
    new_row = final.filter(F.col("str_id") == "zz_new").collect()[0]
    assert new_row.faiss_id == mx  # dense, gap-free
    assert final.count() == mapping.count() + 1


def test_inserting_merges_serialize_on_the_id_counter(spark, tmp_path, mapping):
    """Two INSERTING merges on DISJOINT buckets still conflict: both
    derived new dense-id ranges from the same max_faiss_id, so letting
    both commit would assign colliding ids — the shared-meta-key rule
    forces the loser to recompute; ids stay dense and unique."""
    t = TLog(str(tmp_path / "t"))
    tlog_init_id_mapping(t, mapping, n_buckets=8)
    snap0 = t.snapshot()
    from cnc_visionsearch_spark.operators.ingest import _bucket_expr

    bexpr = _bucket_expr(8)
    # two new keys landing in DIFFERENT buckets (xxhash64-probed)
    k1, k2 = "new_a", "new_b"
    bk = {
        r.s: r.b
        for r in spark.createDataFrame(
            [(k1,), (k2,)], "s string"
        ).select("s", F.pmod(F.xxhash64("s"), F.lit(8)).cast("int").alias("b"))
        .collect()
    }
    assert bk[k1] != bk[k2], "fixture keys must hash to distinct buckets"

    tlog_merge_upsert(t, _mk_batch(spark, [(k1, "x")]))
    # second merge computed against the stale snapshot: disjoint
    # domains, but it also bumps max_faiss_id -> must conflict
    touched = [bk[k2]]
    resident = t.read(spark, snap0, buckets=touched, schema=ID_MAPPING_SCHEMA)
    merged = upsert_id_mapping(
        resident,
        _mk_batch(spark, [(k2, "y")]),
        known_max=int(snap0.meta["max_faiss_id"]),
    )
    adds = t.write_data(merged, bucket_expr=bexpr)
    with pytest.raises(TLogConflictError, match="meta"):
        t.commit(
            adds=adds,
            removes=snap0.files_in(touched),
            read_version=snap0.version,
            op="rewrite",
            domains=touched,
            meta={"max_faiss_id": int(snap0.meta["max_faiss_id"]) + 1},
        )
    run_transaction(lambda: tlog_merge_upsert(t, _mk_batch(spark, [(k2, "y")])))
    final = t.read(spark, schema=ID_MAPPING_SCHEMA)
    ids = [
        r.faiss_id
        for r in final.filter(F.col("str_id").isin(k1, k2)).collect()
    ]
    base = int(snap0.meta["max_faiss_id"])
    assert sorted(ids) == [base + 1, base + 2]  # dense, no collision


def test_update_only_merges_on_disjoint_buckets_dont_conflict(
    spark, tmp_path, mapping
):
    """Update-only merges leave the id counter untouched (no meta
    key), so disjoint-bucket updates racing the same snapshot BOTH
    commit — conflict detection is exactly as coarse as the shared
    state demands, no more."""
    t = TLog(str(tmp_path / "t"))
    tlog_init_id_mapping(t, mapping, n_buckets=8)
    snap0 = t.snapshot()
    from cnc_visionsearch_spark.operators.ingest import _bucket_expr

    bexpr = _bucket_expr(8)
    existing = [r.str_id for r in mapping.select("str_id").limit(40).collect()]
    bk = {
        r.s: r.b
        for r in spark.createDataFrame([(s,) for s in existing], "s string")
        .select("s", F.pmod(F.xxhash64("s"), F.lit(8)).cast("int").alias("b"))
        .collect()
    }
    s1 = next(s for s in existing if bk[s] == min(bk.values()))
    s2 = next(s for s in existing if bk[s] == max(bk.values()))
    assert bk[s1] != bk[s2]

    tlog_merge_upsert(t, _mk_batch(spark, [(s1, "u1")]))
    # second update computed against the stale snapshot: disjoint
    # domains, NO meta key -> commits cleanly
    touched = [bk[s2]]
    resident = t.read(spark, snap0, buckets=touched, schema=ID_MAPPING_SCHEMA)
    merged = upsert_id_mapping(
        resident,
        _mk_batch(spark, [(s2, "u2")]),
        known_max=int(snap0.meta["max_faiss_id"]),
    )
    adds = t.write_data(merged, bucket_expr=bexpr)
    t.commit(
        adds=adds,
        removes=snap0.files_in(touched),
        read_version=snap0.version,
        op="rewrite",
        domains=touched,
        meta={},
    )
    final = t.read(spark, schema=ID_MAPPING_SCHEMA)
    assert final.filter(F.col("str_id") == s1).collect()[0].text_content == "u1"
    assert final.filter(F.col("str_id") == s2).collect()[0].text_content == "u2"
    assert final.count() == mapping.count()


def test_txn_makes_replay_idempotent(spark, tmp_path, mapping):
    """An at-least-once producer re-running a committed batch with the
    same (app, seq) commits NOTHING the second time — the tlog twin of
    the streaming tiers' replay-safety contracts."""
    t = TLog(str(tmp_path / "t"))
    tlog_init_id_mapping(t, mapping, n_buckets=4)
    b = _mk_batch(spark, [("replayed", "once")])
    v1 = tlog_merge_upsert(t, b, txn=("app1", 0))
    v2 = tlog_merge_upsert(t, b, txn=("app1", 0))  # replay
    assert v2 == v1 == t.latest_version()
    final = t.read(spark, schema=ID_MAPPING_SCHEMA)
    assert final.filter(F.col("str_id") == "replayed").count() == 1
    assert final.count() == mapping.count() + 1
    # a LATER seq from the same app does commit
    v3 = tlog_merge_upsert(
        t, _mk_batch(spark, [("replayed", "twice")]), txn=("app1", 1)
    )
    assert v3 == v1 + 1


def test_checkpoint_bounds_replay_and_matches_full_replay(spark, tmp_path):
    """Past CHECKPOINT_EVERY commits, a snapshot built from the
    checkpoint + tail equals one replayed from scratch (checkpoint
    files deleted) — state, meta, and txns all round-trip."""
    t = TLog(str(tmp_path / "t"))
    for i in range(CHECKPOINT_EVERY + 3):
        df = _mk_batch(spark, [(f"k{i}", "v")]).withColumn(
            "faiss_id", F.lit(i).cast("bigint")
        )
        t.commit(
            adds=t.write_data(df),
            op="append",
            meta={f"m{i % 2}": i},
            txn=("app", i),
        )
    ck = [
        f
        for f in os.listdir(t.log_dir)
        if f.endswith(".checkpoint.json")
    ]
    assert len(ck) == 1
    fast = t.snapshot()
    for f in ck:
        os.remove(os.path.join(t.log_dir, f))
    slow = t.snapshot()
    assert fast.version == slow.version
    assert fast.files == slow.files
    assert fast.meta == slow.meta
    assert fast.txns == slow.txns


def test_vacuum_drops_old_rewrites_keeps_current(spark, tmp_path, mapping):
    """Vacuum physically deletes files removed beyond the horizon;
    the CURRENT snapshot still reads intact, and a crashed writer's
    tmp commit file is swept."""
    t = TLog(str(tmp_path / "t"))
    tlog_init_id_mapping(t, mapping, n_buckets=2)
    for i in range(CHECKPOINT_EVERY + 2):
        tlog_merge_upsert(t, _mk_batch(spark, [("img_1", f"v{i}")]))
    open(os.path.join(t.log_dir, ".tmp-dead.json"), "w").close()
    before = t.read(spark, schema=ID_MAPPING_SCHEMA).count()
    deleted = t.vacuum(keep_versions=2, orphan_grace_s=0.0)
    assert deleted, "old rewritten bucket files should be vacuumed"
    assert not os.path.exists(os.path.join(t.log_dir, ".tmp-dead.json"))
    assert t.read(spark, schema=ID_MAPPING_SCHEMA).count() == before
    row = (
        t.read(spark, schema=ID_MAPPING_SCHEMA)
        .filter(F.col("str_id") == "img_1")
        .collect()[0]
    )
    assert row.text_content == f"v{CHECKPOINT_EVERY + 1}"


def test_torn_commit_tmp_never_visible(spark, tmp_path):
    """A fully-written-then-linked commit record is the ONLY way a
    version appears: a leftover tmp file (crash before link) is
    invisible to snapshots and claims no version."""
    t = TLog(str(tmp_path / "t"))
    df = _mk_batch(spark, [("a", "1")]).withColumn(
        "faiss_id", F.lit(1).cast("bigint")
    )
    t.commit(adds=t.write_data(df), op="append")
    # simulate a crashed writer: tmp written, link never happened
    with open(os.path.join(t.log_dir, ".tmp-crashed.json"), "w") as f:
        json.dump({"version": 2, "op": "append", "add": []}, f)
    assert t.latest_version() == 1
    v = t.commit(adds=t.write_data(df), op="append")
    assert v == 2  # the tmp claimed nothing


def test_merge_reads_only_touched_buckets(spark, tmp_path, mapping):
    """The merge's resident read is log-tag pruned to the touched
    buckets' files — at 100 TB a single-key upsert reads 1/n_buckets
    of the table, never all of it."""
    t = TLog(str(tmp_path / "t"))
    tlog_init_id_mapping(t, mapping, n_buckets=8)
    snap = t.snapshot()
    assert len(snap.files) == 8  # one file per bucket (repartition)
    from cnc_visionsearch_spark.operators.ingest import _bucket_expr

    one = _mk_batch(spark, [("img_7", "touch")])
    touched = [
        r["_tb"]
        for r in one.select(_bucket_expr(8).alias("_tb")).distinct().collect()
    ]
    assert len(snap.files_in(touched)) == 1
    tlog_merge_upsert(t, one)
    snap2 = t.snapshot()
    # rewrite replaced exactly that one bucket file
    assert len(snap2.files) == 8
    changed = set(snap2.files) - set(snap.files)
    assert len(changed) == 1 and {b for _, b in changed} == set(touched)


def test_tlog_upsert_stream_exactly_once_and_equals_batch(
    spark, tmp_path, mapping
):
    """Streamed upserts == sequential batch merges over the same
    chunks, AND replaying a committed batch's foreachBatch (the
    at-least-once hazard) commits nothing — idempotence lives in the
    table's txn records, not the checkpoint alone."""
    from cnc_visionsearch_spark.streaming.pipelines import tlog_upsert_stream

    streamed_t = TLog(str(tmp_path / "streamed"))
    batch_t = TLog(str(tmp_path / "batch"))
    tlog_init_id_mapping(streamed_t, mapping, n_buckets=8)
    tlog_init_id_mapping(batch_t, mapping, n_buckets=8)

    c1 = [("img_1", "streamed-1"), ("brand_new_a", "a")]
    c2 = [("brand_new_a", "a2"), ("brand_new_b", "b")]
    stream_in = str(tmp_path / "in")
    for rows in (c1, c2):
        _mk_batch(spark, rows).coalesce(1).write.mode("append").parquet(
            stream_in
        )
    tlog_upsert_stream(
        spark,
        stream_in,
        str(tmp_path / "streamed"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    ).start().awaitTermination(180)

    for rows in (c1, c2):
        tlog_merge_upsert(batch_t, _mk_batch(spark, rows))

    def state(t):
        return sorted(
            (r.str_id, r.faiss_id, r.text_content)
            for r in t.read(spark, schema=ID_MAPPING_SCHEMA).collect()
        )

    assert state(streamed_t) == state(batch_t)
    assert int(streamed_t.snapshot().meta["max_faiss_id"]) == int(
        batch_t.snapshot().meta["max_faiss_id"]
    )

    # replay: re-commit chunk 2 under its committed txn key -> no-op
    v = streamed_t.latest_version()
    snap = streamed_t.snapshot()
    app = next(a for a in snap.txns if a.startswith("stream-"))
    v2 = tlog_merge_upsert(
        streamed_t, _mk_batch(spark, c2), txn=(app, 1)
    )
    assert v2 == v and state(streamed_t) == state(batch_t)


def test_vacuum_sweeps_orphaned_writer_data_after_grace(
    spark, tmp_path, mapping
):
    """A transaction that wrote data but lost its conflict check (and
    never retried) leaves an unreferenced data dir: vacuum sweeps it
    once it outlives the grace window, never touches referenced dirs,
    and a YOUNG orphan survives (an in-flight writer's data exists
    legitimately before its commit lands)."""
    t = TLog(str(tmp_path / "t"))
    tlog_init_id_mapping(t, mapping, n_buckets=2)
    # simulate the conflicted writer: data written, commit never landed
    orphan_adds = t.write_data(_mk_batch(spark, [("x", "y")]).withColumn(
        "faiss_id", F.lit(99).cast("bigint")
    ))
    orphan = orphan_adds[0]["path"].split("/")[1]
    assert os.path.isdir(os.path.join(t.root, "data", orphan))

    t.vacuum(orphan_grace_s=3600)  # young orphan: survives
    assert os.path.isdir(os.path.join(t.root, "data", orphan))
    swept = t.vacuum(orphan_grace_s=0.0)  # past grace: swept
    assert os.path.join("data", orphan) in swept
    assert not os.path.isdir(os.path.join(t.root, "data", orphan))
    # referenced data untouched, table reads intact
    assert (
        t.read(spark, schema=ID_MAPPING_SCHEMA).count() == mapping.count()
    )


def test_change_feed_classifies_and_reads_only_changed_files(
    spark, tmp_path, mapping
):
    """The change feed between two versions yields exactly the row
    deltas — insert / update_pre / update_post / delete — and derives
    them from the files the interval's commits added or removed, never
    a full snapshot (rewritten-but-identical rows cancel)."""
    t = TLog(str(tmp_path / "t"))
    tlog_init_id_mapping(t, mapping, n_buckets=4)
    v1 = t.latest_version()
    tlog_merge_upsert(
        t, _mk_batch(spark, [("img_2", "changed"), ("fresh_k", "born")])
    )
    # a delete: rewrite one bucket dropping img_4's row
    snap = t.snapshot()
    from cnc_visionsearch_spark.operators.ingest import _bucket_expr

    bexpr = _bucket_expr(4)
    bkt = spark.createDataFrame([("img_4",)], "s string").select(
        F.pmod(F.xxhash64("s"), F.lit(4)).cast("int").alias("b")
    ).collect()[0].b
    kept = t.read(spark, snap, buckets=[bkt], schema=ID_MAPPING_SCHEMA).filter(
        F.col("str_id") != "img_4"
    )
    t.commit(
        adds=t.write_data(kept, bucket_expr=bexpr),
        removes=snap.files_in([bkt]),
        read_version=snap.version,
        op="rewrite",
        domains=[bkt],
    )
    feed = t.change_feed(
        spark, v_from=v1, key="str_id", schema=ID_MAPPING_SCHEMA
    )
    got = {
        (r.str_id, r._change_type)
        for r in feed.collect()
        if r.str_id in ("img_2", "img_4", "fresh_k")
    }
    assert got == {
        ("img_2", "update_pre"),
        ("img_2", "update_post"),
        ("fresh_k", "insert"),
        ("img_4", "delete"),
    }
    # rewritten-but-identical rows cancel: nothing else surfaces
    others = feed.filter(
        ~F.col("str_id").isin("img_2", "img_4", "fresh_k")
    ).count()
    assert others == 0
    # and the feed's inputs are ONLY the interval's changed files
    a, b = t.snapshot(v1), t.snapshot()
    changed = set(dict(a.files)) ^ set(dict(b.files))
    assert len(changed) < len(b.files) + len(a.files)


def test_init_refuses_nonempty_log(spark, tmp_path, mapping):
    """Re-running init against a surviving log must RAISE: a tlog
    rerun appends (never overwrites), so a second init would land a
    duplicate full mapping and reset the dense-id high-water mark."""
    t = TLog(str(tmp_path / "t"))
    tlog_init_id_mapping(t, mapping, n_buckets=4)
    with pytest.raises(ValueError, match="already holds"):
        tlog_init_id_mapping(t, mapping, n_buckets=4)


def test_merge_rejects_null_key(spark, tmp_path, mapping):
    """A batch row with NULL str_id has no bucket and no reference
    analog — the merge rejects it loudly instead of crashing on a
    None-vs-int sort or writing a Hive default partition."""
    t = TLog(str(tmp_path / "t"))
    tlog_init_id_mapping(t, mapping, n_buckets=4)
    bad = spark.createDataFrame(
        [(None, "x"), ("ok", "y")], "str_id string, text_content string"
    )
    with pytest.raises(ValueError, match="NULL str_id"):
        tlog_merge_upsert(t, bad)


def test_meta_carrying_append_does_not_rebase_past_counter_commit(
    spark, tmp_path, mapping
):
    """An APPEND carrying a meta key (an init stamping max_faiss_id)
    that loses the version race to a commit deriving the SAME key must
    conflict instead of silently rebasing — latest-wins meta would
    clobber the racing writer's high-water mark and re-mint its ids."""
    t = TLog(str(tmp_path / "t"))
    tlog_init_id_mapping(t, mapping, n_buckets=4)
    tlog_merge_upsert(t, _mk_batch(spark, [("fresh_x", "a")]))  # bumps meta
    adds = t.write_data(
        _mk_batch(spark, [("z", "b")]).withColumn(
            "faiss_id", F.lit(1).cast("bigint")
        )
    )
    # simulate the loser: its first attempt (base_version) was BEFORE
    # the merge landed; commit() tracks that via the version race —
    # reproduce by claiming the merge's version out from under it
    import unittest.mock as mock

    real_latest = t.latest_version
    seen = {"n": 0}

    def racing_latest():
        # first call returns a stale version (pre-merge), later calls
        # see the truth — exactly the lost-race interleave
        seen["n"] += 1
        return real_latest() - 1 if seen["n"] == 1 else real_latest()

    with mock.patch.object(t, "latest_version", racing_latest):
        with pytest.raises(TLogConflictError, match="meta"):
            t.commit(adds=adds, op="append", meta={"max_faiss_id": 1})


def test_thousand_commit_snapshot_never_lists_the_log(tmp_path):
    """r8 verdict #4: snapshot/commit cost must not be O(total
    commits). A 1,000-commit log's latest_version/snapshot run with
    ZERO directory listings (the ``_last_checkpoint`` pointer + the
    contiguous-version forward probe replace them) and the replay
    window stays O(CHECKPOINT_EVERY)."""
    import cnc_visionsearch_spark.sources.tlog as tlog_mod

    t = TLog(str(tmp_path / "t"))
    for i in range(1000):
        t.commit(adds=[{"path": f"data/f{i}", "bucket": None}], op="append")
    calls = {"listdir": 0}
    real_listdir = os.listdir

    def counting_listdir(p):
        calls["listdir"] += 1
        return real_listdir(p)

    reads = {"n": 0}
    real_read = t._read_commit

    def counting_read(v):
        reads["n"] += 1
        return real_read(v)

    t._read_commit = counting_read
    try:
        tlog_mod.os.listdir = counting_listdir
        assert t.latest_version() == 1000
        snap = t.snapshot()
    finally:
        tlog_mod.os.listdir = real_listdir
        t._read_commit = real_read
    assert calls["listdir"] == 0
    assert reads["n"] <= CHECKPOINT_EVERY
    assert snap.version == 1000 and len(snap.files) == 1000
    # time travel BELOW the pointer still resolves (downward walk to
    # the nearest older checkpoint)
    old = t.snapshot(15)
    assert old.version == 15 and len(old.files) == 15


def test_racing_inits_serialize_via_base_version(spark, tmp_path, mapping):
    """The init emptiness check is not check-then-act (r8 advice):
    writer A observes an EMPTY log, then writer B's full init lands;
    A's commit (carrying base_version=0, the version it observed) must
    raise instead of appending a duplicate mapping and resetting the
    id counter."""
    t = TLog(str(tmp_path / "t"))
    assert t.latest_version() == 0  # A's observation
    tlog_init_id_mapping(t, mapping, n_buckets=4)  # B lands in the gap
    adds = t.write_data(
        mapping.select("str_id", "faiss_id", "text_content")
    )
    with pytest.raises(TLogConflictError, match="meta"):
        t.commit(
            adds=adds,
            op="append",
            meta={"max_faiss_id": 7, "n_buckets": 4},
            base_version=0,
        )


def test_write_data_null_bucket_raises_targeted_error(spark, tmp_path):
    """A NULL merge key reaching a bucketed write must fail with the
    cause (non-null key contract), not a bare int() ValueError on the
    Hive default partition dir (r8 advice)."""
    t = TLog(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(None, 1, "x"), ("k", 2, "y")], ID_MAPPING_SCHEMA
    )
    with pytest.raises(ValueError, match="non-null"):
        t.write_data(
            df,
            # NULL-propagating bucket fn (xxhash64 itself hashes NULL
            # to the seed, so force the NULL through like a modulo of
            # a NULL-keyed cast would)
            bucket_expr=F.when(
                F.col("str_id").isNotNull(),
                F.pmod(F.xxhash64("str_id"), F.lit(4)).cast("int"),
            ),
        )


def test_restore_rolls_back_as_new_commit(spark, tmp_path, mapping):
    """RESTORE re-points the live file set at the target version as a
    NEW commit: the undone merge leaves no trace in the live read, the
    meta counter rolls back with the data, and the undone state stays
    time-travel-readable."""
    t = TLog(str(tmp_path / "t"))
    tlog_init_id_mapping(t, mapping, n_buckets=4)
    m1 = int(t.snapshot().meta["max_faiss_id"])
    tlog_merge_upsert(t, _mk_batch(spark, [("zz_r", "one")]))
    assert int(t.snapshot().meta["max_faiss_id"]) == m1 + 1
    v = t.restore(1)
    assert v == 3  # history preserved, restore is its own commit
    assert int(t.snapshot().meta["max_faiss_id"]) == m1
    live = {
        r.str_id for r in t.read(spark, schema=ID_MAPPING_SCHEMA).collect()
    }
    assert "zz_r" not in live
    # the undone version is still readable (time travel)
    v2 = {
        r.str_id for r in t.read(spark, 2, schema=ID_MAPPING_SCHEMA).collect()
    }
    assert "zz_r" in v2
    # the table continues: a post-restore merge mints from the
    # RESTORED counter (no collision with the undone merge's id)
    tlog_merge_upsert(t, _mk_batch(spark, [("zz_s", "two")]))
    rows = {
        r.str_id: r.faiss_id
        for r in t.read(spark, schema=ID_MAPPING_SCHEMA).collect()
    }
    assert rows["zz_s"] == m1 + 1


def test_restore_conflicts_with_racing_commit(spark, tmp_path, mapping):
    """RESTORE declares the WHOLE table (domains=None): a commit
    landing inside its read->claim window must conflict — a rollback
    may never silently drop a concurrent write."""
    import unittest.mock as mock

    t = TLog(str(tmp_path / "t"))
    tlog_init_id_mapping(t, mapping, n_buckets=4)
    tlog_merge_upsert(t, _mk_batch(spark, [("zz_a", "x")]))
    real_latest = t.latest_version
    calls = {"n": 0}

    def racing_latest():
        calls["n"] += 1
        if calls["n"] == 1:
            # the restore observes v2... then a merge lands
            v = real_latest()
            tlog_merge_upsert(t, _mk_batch(spark, [("zz_b", "y")]))
            return v
        return real_latest()

    with mock.patch.object(t, "latest_version", racing_latest):
        with pytest.raises(TLogConflictError):
            t.restore(1)
    # the racing write survived; a clean retry works
    t.restore(1)
    live = {
        r.str_id for r in t.read(spark, schema=ID_MAPPING_SCHEMA).collect()
    }
    assert "zz_a" not in live and "zz_b" not in live


def test_restore_past_vacuum_horizon_raises(spark, tmp_path, mapping):
    """A file physically removed by vacuum cannot be restored — the
    error names the missing file instead of a later read exploding."""
    t = TLog(str(tmp_path / "t"))
    tlog_init_id_mapping(t, mapping, n_buckets=4)
    tlog_merge_upsert(t, _mk_batch(spark, [("zz_v", "x")]))
    # enough commits to push v1's rewritten files past retention
    for i in range(12):
        tlog_merge_upsert(t, _mk_batch(spark, [(f"zz_{i}", "y")]))
    t.vacuum(keep_versions=2, orphan_grace_s=0.0)
    with pytest.raises(ValueError, match="physically removed by vacuum"):
        t.restore(1)


def test_history_describes_commits_newest_first(spark, tmp_path, mapping):
    """DESCRIBE HISTORY shape: per-version op/action-count/meta/txn
    rows from the log alone, newest first; `limit` bounds the walk."""
    t = TLog(str(tmp_path / "t"))
    tlog_init_id_mapping(t, mapping, n_buckets=4)
    tlog_merge_upsert(t, _mk_batch(spark, [("zz_h", "x")]), txn=("h", 1))
    t.restore(1)
    h = t.history()
    assert [r["version"] for r in h] == [3, 2, 1]
    assert h[0]["op"] == "rewrite" and h[0]["domains"] is None  # restore
    assert h[1]["op"] == "rewrite" and h[1]["txn"] == {"app": "h", "seq": 1}
    assert h[2]["op"] == "append" and "max_faiss_id" in h[2]["meta_keys"]
    assert [r["version"] for r in t.history(limit=2)] == [3, 2]
