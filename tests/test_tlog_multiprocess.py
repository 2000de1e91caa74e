"""Cross-PROCESS tlog stress (r9 verdict #6).

Every prior race test is in-process (threads + monkeypatched fault
injection — tests/test_tlog.py, tests/test_tlog_artifacts.py), but the
protocol's atomicity claim rests on ``os.link`` create-exclusive
semantics ACROSS processes — the primitive only a real multi-process
hammer exercises. Here N worker processes run append / shared-meta
read-modify-write / disjoint-compact / contended-compact loops against
ONE table, and the parent asserts:

(a) versions are CONTIGUOUS and each was claimed by exactly one worker
    (no version double-claimed, the create-exclusive property);
(b) the shared meta counter equals the total number of increments —
    every cross-process read-modify-write serialized through the
    meta-rebase conflict window (commit(base_version=...));
(c) the final live file set equals an INDEPENDENT serial replay of the
    raw commit records (this test's own replay, not Snapshot's).

Workers use the "spawn" start method: a fork of the pytest process
(live py4j/JVM threads) could inherit held locks; spawned children
import only os/json + the tlog module and never touch Spark.

Platform caveat (also in sources/tlog.py): os.link create-exclusive is
a POSIX-filesystem property; object stores without atomic
create-no-overwrite take the rename-without-overwrite variant.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os

from cnc_visionsearch_spark.sources.tlog import TLog, run_transaction

N_WORKERS = 6
ITERS = 12
SHARED_BUCKET = 999
_RETRIES = 2000  # per-transaction optimistic retries under 6-way contention


def _hammer(root: str, wid: int, iters: int, q) -> None:
    """One worker process: per iteration, a blind append into its own
    bucket, a blind append into the SHARED bucket, and a shared-key
    meta counter increment; every 4th iteration also a compact of its
    own bucket (disjoint domains — must never conflict with the other
    workers) and a compact of the shared bucket (races every other
    worker's appends — the cross-process conflict-and-recompute path).
    Commit payloads reference fabricated data paths: the log arbitrates
    metadata; no parquet needs to exist for the protocol itself."""
    t = TLog(root)
    claimed: list[int] = []
    bumps = 0
    try:
        for i in range(iters):
            claimed.append(
                t.commit(
                    adds=[
                        {"path": f"data/w{wid}_{i}.parquet", "bucket": wid}
                    ],
                    op="append",
                )
            )
            claimed.append(
                t.commit(
                    adds=[
                        {
                            "path": f"data/s{wid}_{i}.parquet",
                            "bucket": SHARED_BUCKET,
                        }
                    ],
                    op="append",
                )
            )

            def bump():
                snap = t.snapshot()
                cur = int(snap.meta.get("ctr", 0))
                return t.commit(
                    op="append",
                    meta={"ctr": cur + 1},
                    base_version=snap.version,
                )

            claimed.append(run_transaction(bump, max_retries=_RETRIES))
            bumps += 1

            if i % 4 == 3:

                def compact_mine():
                    snap = t.snapshot()
                    mine = [p for p, b in snap.files if b == wid]
                    return t.commit(
                        adds=[
                            {
                                "path": f"data/w{wid}_c{i}.parquet",
                                "bucket": wid,
                            }
                        ],
                        removes=mine,
                        read_version=snap.version,
                        op="rewrite",
                        domains=[wid],
                    )

                claimed.append(
                    run_transaction(compact_mine, max_retries=_RETRIES)
                )

                def compact_shared():
                    snap = t.snapshot()
                    shared = [
                        p for p, b in snap.files if b == SHARED_BUCKET
                    ]
                    return t.commit(
                        adds=[
                            {
                                "path": f"data/sc{wid}_{i}.parquet",
                                "bucket": SHARED_BUCKET,
                            }
                        ],
                        removes=shared,
                        read_version=snap.version,
                        op="rewrite",
                        domains=[SHARED_BUCKET],
                    )

                claimed.append(
                    run_transaction(compact_shared, max_retries=_RETRIES)
                )
        q.put((wid, claimed, bumps, None))
    except Exception as e:  # pragma: no cover — surfaced in the parent
        q.put((wid, claimed, bumps, repr(e)))


def test_tlog_cross_process_stress(tmp_path):
    root = str(tmp_path / "table")
    t = TLog(root)  # creates _tlog/
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_hammer, args=(root, w, ITERS, q))
        for w in range(N_WORKERS)
    ]
    for p in procs:
        p.start()
    results = [q.get(timeout=600) for _ in procs]
    for p in procs:
        p.join(60)
    errs = [(w, e) for w, _c, _b, e in results if e]
    assert not errs, f"worker failures: {errs}"

    # (a) contiguous versions; every version claimed by EXACTLY one
    # worker — os.link create-exclusive held across processes
    latest = t.latest_version()
    versions = t._versions()
    assert versions == list(range(1, latest + 1))
    all_claimed = sorted(v for _w, cl, _b, _e in results for v in cl)
    assert len(all_claimed) == len(set(all_claimed)), "version double-claimed"
    assert all_claimed == versions

    # (b) the shared counter serialized: final value == total bumps
    snap = t.snapshot()
    total_bumps = sum(b for _w, _c, b, _e in results)
    assert total_bumps == N_WORKERS * ITERS
    assert int(snap.meta["ctr"]) == total_bumps

    # (c) final live set == independent serial replay of the raw records
    live: dict[str, int | None] = {}
    for v in versions:
        with open(os.path.join(root, "_tlog", f"{v:020d}.json")) as f:
            c = json.load(f)
        for rp in c.get("remove", []):
            live.pop(rp, None)
        for a in c.get("add", []):
            live[a["path"]] = a.get("bucket")
    assert sorted(live.items()) == snap.files

    # sanity on the workload itself: the contended shared-bucket
    # compacts really ran (the shared bucket holds exactly the files
    # the replay says it should, and at least one compact landed)
    ops = [
        json.load(open(os.path.join(root, "_tlog", f"{v:020d}.json")))["op"]
        for v in versions
    ]
    assert ops.count("rewrite") >= N_WORKERS  # compacts landed
