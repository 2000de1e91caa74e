"""Minimal optimistic-concurrency transaction log over parquet.

The reference's id_mapping lives in SQLite (main.py:104-135), whose
single-writer file lock IS its concurrency story; SURVEY §1.2 maps
those upserts to a table format's ``MERGE INTO``. This container has
no importable Delta/Iceberg (re-verified every round), and the repo's
tmp+rename artifact protocol (SCALE.md "Table-format stance") buys
only single-writer-per-artifact semantics — its documented gap is
"no conflict detection between DIFFERENT mutations of one artifact".
This module closes that gap with the PUBLIC protocol those formats
use (Armbrust et al., "Delta Lake: High-Performance ACID Table
Storage over Cloud Object Stores", VLDB 2020):

- a table is a directory of immutable parquet data files plus a
  ``_tlog/`` directory of monotonically numbered JSON commit records;
- a commit atomically claims version N by creating ``_tlog/N.json``
  with a create-exclusive primitive (here ``os.link`` from a fully
  written tmp file — the record appears complete or not at all; on
  HDFS/ABFS the same role is played by rename-without-overwrite);
- losers of the race re-read the log and either REBASE (blind appends
  and disjoint-domain rewrites retry at the next version untouched)
  or raise :class:`TLogConflictError` (overlapping-domain rewrites:
  the transaction's inputs changed, the caller must recompute — the
  optimistic loop :func:`run_transaction` packages);
- readers reconstruct the file set of ANY version (snapshot isolation
  + time travel) by replaying add/remove actions; a full-state
  checkpoint record every ``CHECKPOINT_EVERY`` commits bounds replay
  length (the Delta checkpoint doctrine);
- ``txn`` records (app id, sequence) make replayed writers idempotent
  (Structured Streaming's foreachBatch is at-least-once; a replayed
  batch finds its own txn in the log and commits nothing) — Delta's
  ``SetTransaction`` action;
- ``meta`` key-values ride commits latest-wins: the id_mapping table
  stores its running MAX(faiss_id) there, so an upsert touching a
  SUBSET of buckets still assigns globally dense ids without scanning
  resident state (the ``known_max`` seam in operators/ingest).

Atomicity scope: ``os.link`` create-exclusive is a POSIX-filesystem
property (local disk, NFSv4, HDFS-mounted); it is exercised ACROSS
processes by tests/test_tlog_multiprocess.py (N processes hammering
one table: no version double-claimed, shared meta counter fully
serialized, final state == serial replay). S3-style object stores
without atomic create-no-overwrite need the coordination service /
rename-without-overwrite variant the Delta paper describes — swap
:meth:`TLog.commit`'s link for that primitive, nothing else changes.

Scale shape: commit records are O(files touched) JSON on the driver —
data-proportional work stays in Spark jobs; the log arbitrates, never
carries rows. Conflict DOMAINS are hash buckets of the merge key, so
concurrent merges over disjoint key ranges commit without recompute,
and the per-merge rewrite reads only the touched buckets' files (the
log's per-add bucket tag prunes; the bucket is a pure function of the
key, never stored in the data).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

CHECKPOINT_EVERY = 10
_LOG_DIR = "_tlog"
_LAST_CKPT = "_last_checkpoint"
_W = 20  # zero-padded version width -> lexicographic == numeric order

__all__ = [
    "TLog",
    "TLogConflictError",
    "Snapshot",
    "run_transaction",
    "tlog_of",
    "CHECKPOINT_EVERY",
]


def tlog_of(path: str) -> "TLog | None":
    """Handle on ``path`` when it is a transactional table (its
    ``_tlog/`` dir exists), else None — the mode dispatch the dual-mode
    artifact layers (inverted index, IVF, MinHash store) share."""
    if os.path.isdir(os.path.join(path, _LOG_DIR)):
        return TLog(path)
    return None


class TLogConflictError(Exception):
    """A concurrent commit invalidated this transaction's inputs
    (overlapping conflict domains or removes). Re-read the snapshot
    and recompute — :func:`run_transaction` does."""


class Snapshot:
    """An immutable view of one table version.

    ``files``: [(relative_path, bucket_or_None)] currently live;
    ``meta``: latest-wins key-values across commits <= version;
    ``txns``: {app_id: highest committed sequence} (idempotence);
    ``removed_at``: {relative_path: version} for files no longer live
    (vacuum's input).
    """

    __slots__ = ("version", "files", "meta", "txns", "removed_at")

    def __init__(self, version, files, meta, txns, removed_at):
        self.version = version
        self.files = files
        self.meta = meta
        self.txns = txns
        self.removed_at = removed_at

    def files_in(self, buckets) -> list[str]:
        """Live paths whose bucket tag is in ``buckets`` — plus any
        untagged (bucket=None) files, which may hold any key."""
        bs = set(buckets)
        return [p for p, b in self.files if b is None or b in bs]


class TLog:
    """Handle on one transactional parquet table rooted at ``path``."""

    def __init__(self, path: str):
        self.root = path
        self.log_dir = os.path.join(path, _LOG_DIR)
        os.makedirs(self.log_dir, exist_ok=True)

    # ---- log primitives -------------------------------------------------

    def _commit_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:0{_W}d}.json")

    def _versions(self) -> list[int]:
        """FULL listing of committed versions — O(total commits).
        Reserved for maintenance (vacuum's referenced-set sweep);
        snapshot/commit paths use the ``_last_checkpoint``-anchored
        probing (:meth:`latest_version`) so a long-lived table never
        pays a full log listing per transaction (the Delta
        ``_last_checkpoint`` doctrine — r8 verdict #4)."""
        out = []
        for f in os.listdir(self.log_dir):
            if f.endswith(".json") and not f.endswith(".checkpoint.json"):
                stem = f[: -len(".json")]
                if stem.isdigit():
                    out.append(int(stem))
        return sorted(out)

    def _last_checkpoint_version(self) -> int:
        """Version of the newest checkpoint, from the ``_last_checkpoint``
        pointer file (0 = none). The pointer is advisory: a missing or
        stale pointer only lengthens the probe, never changes results
        (checkpoints themselves are derived state)."""
        p = os.path.join(self.log_dir, _LAST_CKPT)
        try:
            with open(p) as f:
                return int(json.load(f)["version"])
        except (FileNotFoundError, ValueError, KeyError, json.JSONDecodeError):
            return 0

    def latest_version(self) -> int:
        """Highest committed version; 0 = empty table (version numbers
        start at 1). Versions are CONTIGUOUS by construction (every
        commit claims exactly current+1 via create-exclusive link), so
        the probe walks forward from the last checkpoint pointer —
        O(commits since the last checkpoint), never a full log listing
        (10^5-commit tables pay ~CHECKPOINT_EVERY stat calls)."""
        v = self._last_checkpoint_version()
        if v and not os.path.exists(self._commit_path(v)):
            v = 0  # corrupt/foreign pointer: fall back to probing from 0
        while os.path.exists(self._commit_path(v + 1)):
            v += 1
        return v

    def _read_commit(self, version: int) -> dict:
        with open(self._commit_path(version)) as f:
            return json.load(f)

    def snapshot(self, version: int | None = None) -> Snapshot:
        """Reconstruct the file set / meta / txns of ``version``
        (default: latest). Replays from the newest checkpoint at or
        below the target — found via the ``_last_checkpoint`` pointer,
        never a full log listing — so work is O(CHECKPOINT_EVERY)
        commits however long the table has lived."""
        if version is None:
            version = self.latest_version()
        elif version and not os.path.exists(self._commit_path(version)):
            raise ValueError(f"tlog {self.root}: no version {version}")
        live: dict[str, int | None] = {}
        meta: dict = {}
        txns: dict[str, int] = {}
        removed_at: dict[str, int] = {}
        start = 0
        # newest checkpoint at or below the target: the pointer answers
        # directly unless the target is a TIME TRAVEL below it, where a
        # downward walk over checkpoint multiples (bounded stat probes)
        # finds the nearest older checkpoint
        lc = self._last_checkpoint_version()
        if not (
            lc
            and lc <= version
            and os.path.exists(self._commit_path(lc) + ".checkpoint.json")
        ):
            lc = version - (version % CHECKPOINT_EVERY)
            while lc > 0 and not os.path.exists(
                self._commit_path(lc) + ".checkpoint.json"
            ):
                lc -= CHECKPOINT_EVERY
        if lc > 0:
            start = lc
            with open(self._commit_path(lc) + ".checkpoint.json") as f:
                st = json.load(f)
            live = {a["path"]: a.get("bucket") for a in st["files"]}
            meta = st.get("meta", {})
            txns = {k: int(s) for k, s in st.get("txns", {}).items()}
            removed_at = {
                k: int(s) for k, s in st.get("removed_at", {}).items()
            }
        for v in range(start + 1, version + 1):
            c = self._read_commit(v)
            for p in c.get("remove", []):
                live.pop(p, None)
                removed_at[p] = v
            for a in c.get("add", []):
                live[a["path"]] = a.get("bucket")
                removed_at.pop(a["path"], None)
            meta.update(c.get("meta", {}))
            t = c.get("txn")
            if t:
                prev = txns.get(t["app"], -1)
                txns[t["app"]] = max(prev, int(t["seq"]))
        return Snapshot(version, sorted(live.items()), meta, txns, removed_at)

    # ---- writing --------------------------------------------------------

    def write_data(self, df: DataFrame, bucket_expr=None) -> list[dict]:
        """Write ``df`` as immutable parquet under a fresh
        ``data/<opid>/`` dir and return add-actions for :meth:`commit`.
        With ``bucket_expr`` (a Column producing an INT bucket id, a
        pure function of the merge key — never stored), rows are
        partitioned so each bucket's rows land in their own subdir and
        each add-action carries its bucket tag for read pruning."""
        opid = uuid.uuid4().hex[:16]
        rel = os.path.join("data", opid)
        target = os.path.join(self.root, rel)
        if bucket_expr is None:
            df.write.parquet(target)
            return [{"path": rel, "bucket": None}]
        (
            df.withColumn("_tb", bucket_expr)
            .repartition("_tb")
            .write.partitionBy("_tb")
            .parquet(target)
        )
        adds = []
        for d in sorted(os.listdir(target)):
            if d.startswith("_tb="):
                if d == "_tb=__HIVE_DEFAULT_PARTITION__":
                    # a NULL bucket value means a NULL merge key reached
                    # a bucketed write (bucket exprs are pure functions
                    # of the key) — fail with the cause, not a bare
                    # int() ValueError after the data already landed
                    raise ValueError(
                        f"tlog {self.root}: bucketed write produced a "
                        "NULL bucket partition — the merge key (and so "
                        "bucket_expr) must be non-null; filter or "
                        "repair the source before writing"
                    )
                adds.append(
                    {"path": os.path.join(rel, d), "bucket": int(d[4:])}
                )
        return adds

    def read(
        self,
        spark: SparkSession,
        version: "int | Snapshot | None" = None,
        buckets=None,
        schema: str | None = None,
    ) -> DataFrame:
        """DataFrame over the snapshot's live files (optionally only
        the given buckets' files — log-tag pruning, no footer reads).
        ``schema`` keeps an empty snapshot readable."""
        snap = (
            self.snapshot(version)
            if not isinstance(version, Snapshot)
            else version
        )
        paths = (
            snap.files_in(buckets)
            if buckets is not None
            else [p for p, _ in snap.files]
        )
        if not paths:
            if schema is None:
                raise ValueError(
                    f"tlog {self.root} v{snap.version} is empty and no "
                    "schema was given"
                )
            return spark.createDataFrame([], schema)
        full = [os.path.join(self.root, p) for p in paths]
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.parquet(*full)

    def commit(
        self,
        adds: list[dict] | None = None,
        removes: list[str] | None = None,
        read_version: int | None = None,
        op: str = "append",
        domains: list[int] | None = None,
        meta: dict | None = None,
        txn: tuple[str, int] | None = None,
        base_version: int | None = None,
    ) -> int:
        """Atomically commit one transaction; returns its version.

        ``base_version`` (append commits carrying meta only): the
        version the CALLER observed when it derived the meta values —
        the meta-rebase conflict window then covers the caller's whole
        check-to-commit span, not just the commit loop's own retries
        (closes the init check-then-act race: two concurrent inits that
        both observed version 0 serialize on the meta key).

        ``op="append"`` (no removes): never conflicts — on losing the
        version race it silently rebases to the next number.
        ``op="rewrite"``: declares the conflict ``domains`` (bucket
        ids; None = whole table) it read and replaces; if any commit
        landed after ``read_version`` whose domains/removes intersect,
        raises :class:`TLogConflictError` — inputs changed, recompute.
        ``txn=(app, seq)``: if the log already holds a commit with this
        app and seq' >= seq, returns THAT state's version committing
        nothing (at-least-once replay becomes exactly-once)."""
        adds = adds or []
        removes = removes or []
        if op == "rewrite" and read_version is None:
            raise ValueError("rewrite commits must declare read_version")
        if op == "append" and removes:
            raise ValueError("append commits cannot remove files")
        while True:
            current = self.latest_version()
            if base_version is None:
                base_version = current
            if txn is not None:
                snap = self.snapshot(current) if current else None
                if snap and snap.txns.get(txn[0], -1) >= txn[1]:
                    return current  # already applied (replay)
            if op == "rewrite":
                self._check_conflicts(
                    read_version, current, removes, domains, meta
                )
            elif meta and current > base_version:
                # an APPEND carrying meta keys (e.g. an init stamping a
                # counter) must not rebase past a commit that derived
                # the same key — latest-wins meta would clobber the
                # racing writer's high-water mark and re-mint its ids
                self._check_conflicts(base_version, current, [], [], meta)
            version = current + 1
            record = {
                "version": version,
                "op": op,
                "read_version": read_version,
                "add": adds,
                "remove": removes,
                "domains": domains,
                "meta": meta or {},
            }
            if txn is not None:
                record["txn"] = {"app": txn[0], "seq": txn[1]}
            tmp = os.path.join(
                self.log_dir, f".tmp-{uuid.uuid4().hex}.json"
            )
            with open(tmp, "w") as f:
                json.dump(record, f)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, self._commit_path(version))
            except FileExistsError:
                os.unlink(tmp)
                continue  # lost the race: re-check conflicts, rebase
            os.unlink(tmp)
            if version % CHECKPOINT_EVERY == 0:
                self._write_checkpoint(version)
            return version

    def _check_conflicts(self, read_version, current, removes, domains, meta):
        my_removes = set(removes)
        my_domains = None if domains is None else set(domains)
        my_meta = set((meta or {}).keys())
        for v in range(read_version + 1, current + 1):
            c = self._read_commit(v)
            their_removes = set(c.get("remove", []))
            if my_removes & their_removes:
                raise TLogConflictError(
                    f"tlog {self.root}: commit {v} already removed "
                    f"{sorted(my_removes & their_removes)[:3]} this "
                    "transaction also removes"
                )
            # meta keys are read-modify-write shared state (e.g. the
            # dense-id high-water mark): two transactions that both
            # derived a new value for one key from their snapshots
            # would silently collide (overlapping id ranges on
            # DISJOINT buckets) — so same-key writers serialize.
            # Writers that leave a counter unchanged omit the key.
            if my_meta & set(c.get("meta", {}).keys()):
                raise TLogConflictError(
                    f"tlog {self.root}: commit {v} updated shared meta "
                    f"key(s) {sorted(my_meta & set(c['meta']))} this "
                    "transaction also derives; recompute"
                )
            theirs = c.get("domains")
            if theirs is None and c.get("op") == "append":
                # blind append's effective domains = its adds' buckets
                theirs = [a.get("bucket") for a in c.get("add", [])]
                if any(b is None for b in theirs):
                    theirs = None  # untagged add may hold any key
            if my_domains is None or theirs is None:
                raise TLogConflictError(
                    f"tlog {self.root}: whole-table transaction raced "
                    f"commit {v}; recompute from version {current}"
                )
            if my_domains & set(theirs):
                raise TLogConflictError(
                    f"tlog {self.root}: commit {v} touched bucket(s) "
                    f"{sorted(my_domains & set(theirs))[:5]} this "
                    "transaction read; recompute"
                )

    def _write_checkpoint(self, version: int) -> None:
        snap = self.snapshot(version)
        state = {
            "version": version,
            "files": [{"path": p, "bucket": b} for p, b in snap.files],
            "meta": snap.meta,
            "txns": snap.txns,
            "removed_at": snap.removed_at,
        }
        p = self._commit_path(version) + ".checkpoint.json"
        tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, p)  # checkpoints are derived state: last wins
        # advance the _last_checkpoint pointer (atomic replace; a stale
        # or lost pointer only lengthens the next probe — a racing
        # OLDER writer can at worst regress it one checkpoint, which
        # the forward probe absorbs)
        mp = os.path.join(self.log_dir, _LAST_CKPT)
        mtmp = mp + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(mtmp, "w") as f:
            json.dump({"version": version}, f)
        os.replace(mtmp, mp)

    def change_feed(
        self,
        spark: SparkSession,
        v_from: int,
        v_to: int | None = None,
        key: str | None = None,
        schema: str | None = None,
    ) -> DataFrame:
        """Row-level changes between two versions (Delta's CHANGE DATA
        FEED shape, derived from the log alone — no per-commit change
        files): reads ONLY the files added or removed in
        ``(v_from, v_to]``, never either full snapshot, so a
        single-bucket merge's feed reads one old + one new file at any
        table size. Rewritten-but-identical rows cancel in the
        EXCEPT ALL diff (they sit in both the added and removed file
        sets), so unchanged buckets and carried-over rows never
        surface.

        Returns rows + ``_change_type``: with ``key``, classified as
        insert / delete / update_pre / update_post by key presence on
        both sides; without, raw +/- row diffs (``insert``/``delete``).
        Multiset semantics (EXCEPT ALL) keep duplicate-row tables
        honest."""
        a = self.snapshot(v_from)
        b = self.snapshot(v_to)
        if b.version < a.version:
            raise ValueError(f"change_feed: v_to {b.version} < v_from {a.version}")
        old_files = dict(a.files)
        new_files = dict(b.files)
        removed = sorted(set(old_files) - set(new_files))
        added = sorted(set(new_files) - set(old_files))

        def _read(paths):
            if not paths:
                if schema is None:
                    raise ValueError(
                        "change_feed over an empty side needs `schema`"
                    )
                return spark.createDataFrame([], schema)
            r = spark.read
            if schema is not None:
                r = r.schema(schema)
            return r.parquet(*[os.path.join(self.root, p) for p in paths])

        import pyspark.sql.functions as F

        old_rows = _read(removed)
        new_rows = _read(added)
        plus = new_rows.exceptAll(old_rows)
        minus = old_rows.exceptAll(new_rows)
        if key is None:
            return plus.withColumn("_change_type", F.lit("insert")).unionByName(
                minus.withColumn("_change_type", F.lit("delete"))
            )
        minus_keys = minus.select(key).distinct()
        plus_keys = plus.select(key).distinct()
        return (
            plus.join(minus_keys.withColumn("_m", F.lit(True)), key, "left")
            .withColumn(
                "_change_type",
                F.when(F.col("_m").isNotNull(), "update_post").otherwise(
                    "insert"
                ),
            )
            .drop("_m")
            .unionByName(
                minus.join(
                    plus_keys.withColumn("_p", F.lit(True)), key, "left"
                )
                .withColumn(
                    "_change_type",
                    F.when(F.col("_p").isNotNull(), "update_pre").otherwise(
                        "delete"
                    ),
                )
                .drop("_p")
            )
        )

    def history(self, limit: int | None = None) -> list[dict]:
        """The table's commit history, newest first (Delta's DESCRIBE
        HISTORY shape): one dict per version with op, read_version,
        file-action counts, conflict domains, meta keys and txn — all
        from the log records alone (no data I/O). ``limit`` bounds the
        walk to the newest N commits (O(limit), not O(history))."""
        cur = self.latest_version()
        lo = 1 if limit is None else max(1, cur - int(limit) + 1)
        out = []
        for v in range(cur, lo - 1, -1):
            c = self._read_commit(v)
            out.append(
                {
                    "version": v,
                    "op": c.get("op"),
                    "read_version": c.get("read_version"),
                    "n_added": len(c.get("add", [])),
                    "n_removed": len(c.get("remove", [])),
                    "domains": c.get("domains"),
                    "meta_keys": sorted(c.get("meta", {}).keys()),
                    "txn": c.get("txn"),
                }
            )
        return out

    def restore(self, version: int) -> int:
        """Roll the table back to ``version`` AS A NEW COMMIT (Delta's
        RESTORE): the target snapshot's files become live again, files
        added after it are removed — no data is copied, and history is
        preserved (time travel still reads the undone versions; a
        second restore can roll forward again). Declared as a
        WHOLE-TABLE rewrite (domains=None), so any racing commit
        conflicts — a restore must never silently drop a concurrent
        write. Meta keys roll back with the data (the dense-id
        high-water mark must match the restored state or later merges
        would mint colliding ids — same reason Delta restores table
        properties).

        Raises if a needed file was physically vacuumed (the Delta
        RESTORE constraint: time travel beyond the vacuum horizon is
        gone; the error names the missing file)."""
        cur = self.latest_version()
        if version == cur:
            return cur
        target = self.snapshot(version)
        current = self.snapshot(cur)
        cur_files = dict(current.files)
        tgt_files = dict(target.files)
        adds = [
            {"path": p, "bucket": b}
            for p, b in target.files
            if p not in cur_files
        ]
        for a in adds:
            if not os.path.exists(os.path.join(self.root, a["path"])):
                raise ValueError(
                    f"tlog {self.root}: cannot restore to version "
                    f"{version} — file {a['path']} was physically "
                    "removed by vacuum (restore horizon = vacuum "
                    "retention)"
                )
        removes = sorted(p for p in cur_files if p not in tgt_files)
        meta = {
            k: v
            for k, v in target.meta.items()
            if current.meta.get(k) != v
        }
        return self.commit(
            adds=adds,
            removes=removes,
            read_version=cur,
            op="rewrite",
            domains=None,
            meta=meta,
        )

    # ---- maintenance ----------------------------------------------------

    def vacuum(
        self,
        keep_versions: int = CHECKPOINT_EVERY,
        orphan_grace_s: float = 3600.0,
    ) -> list[str]:
        """Physically delete data files removed at or before
        ``latest - keep_versions`` (no retained snapshot references
        them: a removed file is absent from every later version).
        Also sweeps orphaned tmp commit files (crashed writers) and
        data dirs no commit EVER referenced (transactions that wrote
        data then lost their conflict check and never retried) — the
        latter only past ``orphan_grace_s`` of age, because an
        in-flight writer's data legitimately exists before its commit
        lands (the Delta VACUUM retention rationale). Returns the
        deleted relative paths. Time travel further back than
        ``keep_versions`` becomes unreadable — the documented trade."""
        import shutil
        import time

        current = self.latest_version()
        cutoff = current - keep_versions
        snap = self.snapshot(current) if current else None
        deleted = []
        if snap:
            for path, v in sorted(snap.removed_at.items()):
                if v <= cutoff:
                    full = os.path.join(self.root, path)
                    if os.path.isdir(full):
                        shutil.rmtree(full, ignore_errors=True)
                        deleted.append(path)
                    elif os.path.exists(full):
                        os.unlink(full)
                        deleted.append(path)
        # orphan sweep: every path any commit ever ADDED is accounted
        # for (live, or removed_at-tracked above); a data dir outside
        # that set belongs to a writer whose commit never landed
        referenced: set[str] = set()
        for v in self._versions():
            for a in self._read_commit(v).get("add", []):
                parts = a["path"].split(os.sep)
                if len(parts) >= 2 and parts[0] == "data":
                    referenced.add(parts[1])  # data/<opid>[/...]
        ddir = os.path.join(self.root, "data")
        now = time.time()
        if os.path.isdir(ddir):
            for d in sorted(os.listdir(ddir)):
                full = os.path.join(ddir, d)
                if (
                    d not in referenced
                    and now - os.path.getmtime(full) > orphan_grace_s
                ):
                    shutil.rmtree(full, ignore_errors=True)
                    deleted.append(os.path.join("data", d))
        # tmp commit files honor the SAME grace as data orphans: an
        # in-flight committer's tmp legitimately exists between its
        # fsync and its os.link — sweeping it ungated would crash the
        # commit (FileNotFoundError from link) or report failure for a
        # transaction whose link already landed
        for f in os.listdir(self.log_dir):
            p = os.path.join(self.log_dir, f)
            if (
                (f.startswith(".tmp-") or ".tmp-" in f)
                and os.path.exists(p)
                and now - os.path.getmtime(p) > orphan_grace_s
            ):
                os.unlink(p)
        return deleted


def run_transaction(fn, max_retries: int = 5):
    """Optimistic-concurrency loop: ``fn()`` reads a fresh snapshot,
    computes, and commits; on :class:`TLogConflictError` it is called
    again (inputs changed under it) up to ``max_retries`` times."""
    if max_retries < 1:
        raise ValueError(f"max_retries must be >= 1: {max_retries}")
    last: TLogConflictError | None = None
    for _ in range(max_retries):
        try:
            return fn()
        except TLogConflictError as e:
            last = e
    raise last
