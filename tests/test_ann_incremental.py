"""Incremental ANN index maintenance (VERDICT r3 §Next-round #1):
append batches must extend a persisted layout without touching existing
files, and probes over the appended layout must equal a from-scratch
computation over the full corpus with the same frozen codebook.
"""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from cnc_visionsearch_spark.operators.ann import (
    ivf_append,
    ivf_assign,
    ivf_build,
    ivf_probe,
    ivf_topk,
    pq_append,
    pq_assign,
    pq_build,
    pq_codebook,
    read_geometry,
    shard_append,
    shard_build,
    sharded_topk_persisted,
)
from cnc_visionsearch_spark.operators.knn import knn_single, with_normalized
from cnc_visionsearch_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"
SPLIT = 300


@pytest.fixture(scope="module")
def emb(spark):
    return with_normalized(load_table(spark, SF, "embeddings"))


def _norm_q(emb, vec_id):
    raw = emb.filter(F.col("vec_id") == vec_id).select("embedding").first()[0]
    q = [float(x) for x in raw]
    n = sum(x * x for x in q) ** 0.5
    return [x / n for x in q]


def _file_md5s(root):
    """relative path -> md5 for every parquet data file under root."""
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, root)] = hashlib.md5(
                        fh.read()
                    ).hexdigest()
    return out


def test_ivf_append_extends_layout_without_touching_files(spark, emb, tmp_path):
    """Build over the base slice, append the rest: every pre-existing
    cell file must survive byte-identical (append adds files, never
    rewrites), and the probe over the appended layout must equal an
    in-memory probe of the FULL corpus assigned against the same
    frozen codebook."""
    path = str(tmp_path / "ivf")
    base = emb.filter(F.col("vec_id") < SPLIT)
    rest = emb.filter(F.col("vec_id") >= SPLIT)
    ivf_build(base, path, n_cells=8)
    before = _file_md5s(f"{path}/cells")
    assert before  # the build wrote real files

    ivf_append(spark, path, rest)
    after = _file_md5s(f"{path}/cells")

    for rel, digest in before.items():
        assert after.get(rel) == digest, f"append rewrote existing file {rel}"
    assert set(after) - set(before), "append added no files"

    # probe equivalence: appended layout == full corpus under the
    # build-time codebook (ids AND exact distances)
    cents = spark.read.parquet(f"{path}/codebook")
    q = _norm_q(emb, 3)
    want = [
        (r.vec_id, r.distance)
        for r in ivf_topk(ivf_assign(emb, cents), cents, q, k=10, nprobe=4).collect()
    ]
    got = [
        (r.vec_id, r.distance)
        for r in ivf_probe(spark, path, q, k=10, nprobe=4).collect()
    ]
    assert got == want
    # the appended half is actually visible to probes
    assert spark.read.parquet(f"{path}/cells").filter(
        F.col("vec_id") >= SPLIT
    ).count() == rest.count()


def test_pq_append_equals_full_reencode(spark, emb, tmp_path):
    """Codes are per-vector functions of the frozen codebook: appending
    the rest's codes must leave existing code files untouched and make
    the code table equal a from-scratch encode of the union."""
    path = str(tmp_path / "ivfpq")
    base = emb.filter(F.col("vec_id") < SPLIT)
    rest = emb.filter(F.col("vec_id") >= SPLIT)
    ivf_build(base, path, n_cells=8)
    pq_build(spark, path, m=8)
    before = _file_md5s(f"{path}/pq_codes")
    assert before

    ivf_append(spark, path, rest)
    pq_append(spark, path, rest, m=8)
    after = _file_md5s(f"{path}/pq_codes")
    for rel, digest in before.items():
        assert after.get(rel) == digest, f"append rewrote existing file {rel}"

    cents = spark.read.parquet(f"{path}/codebook")
    cb = pq_codebook(cents, m=8)
    want = sorted(
        (r.vec_id, r.sub_j, r.code)
        for r in pq_assign(emb, cb, m=8).collect()
    )
    got = sorted(
        (r.vec_id, r.sub_j, r.code)
        for r in spark.read.parquet(f"{path}/pq_codes")
        .select("vec_id", "sub_j", "code")
        .collect()
    )
    assert got == want


def test_shard_append_probe_equals_exact(spark, emb, tmp_path):
    """Appended shard layout: geometry pinned by the sidecar, existing
    shard files untouched, probe equals the exact tier over the UNION
    (numpy local search is exact)."""
    path = str(tmp_path / "shards")
    base = emb.filter(F.col("vec_id") < SPLIT)
    rest = emb.filter(F.col("vec_id") >= SPLIT)
    shard_build(base, path, num_shards=8)
    assert read_geometry(path)["num_shards"] == 8
    before = _file_md5s(f"{path}/shards")

    shard_append(spark, path, rest)
    after = _file_md5s(f"{path}/shards")
    for rel, digest in before.items():
        assert after.get(rel) == digest, f"append rewrote existing file {rel}"

    q = _norm_q(emb, 9)
    want = [
        (r.vec_id, r.distance)
        for r in knn_single(emb, q, k=10, normalize_query=False).collect()
    ]
    got = [
        (r.vec_id, r.distance)
        for r in sharded_topk_persisted(spark, path, q, k=10).collect()
    ]
    assert got == want


def test_shard_append_refuses_mismatched_columns(spark, emb, tmp_path):
    path = str(tmp_path / "shards2")
    shard_build(emb.filter(F.col("vec_id") < 50), path, num_shards=4)
    with pytest.raises(ValueError, match="built with columns"):
        shard_append(
            spark, path, emb.filter(F.col("vec_id") >= 50), id_col="doc_id"
        )


def test_compact_appended_cells_preserves_probe_and_pruning(spark, emb, tmp_path):
    """Repeated appends accrete one file per touched cell per batch —
    compact_layout on the cells/ subtree must shrink files, keep the
    hive partitioning (so PartitionFilters pruning survives), and leave
    probe results bit-identical."""
    from cnc_visionsearch_spark.sources.formats import compact_layout

    path = str(tmp_path / "ivf")
    ivf_build(emb.filter(F.col("vec_id") < 200), path, n_cells=8)
    # five append batches -> up to 5 extra file sets per cell
    for i in range(5):
        ivf_append(
            spark, path, emb.filter((F.col("vec_id") >= 200 + 60 * i) & (F.col("vec_id") < 260 + 60 * i))
        )
    q = _norm_q(emb, 3)
    before = [
        (r.vec_id, r.distance)
        for r in ivf_probe(spark, path, q, k=10, nprobe=4).collect()
    ]

    def n_files():
        return sum(
            1
            for dp, _d, fs in os.walk(f"{path}/cells")
            for f in fs
            if f.endswith(".parquet")
        )

    files_before = n_files()
    compact_layout(spark, f"{path}/cells", partition_by=["cell_id"])
    assert n_files() < files_before
    # hive layout intact -> cell_id IN (...) stays partition pruning
    assert any(
        d.startswith("cell_id=") for d in os.listdir(f"{path}/cells")
    )
    after = [
        (r.vec_id, r.distance)
        for r in ivf_probe(spark, path, q, k=10, nprobe=4).collect()
    ]
    assert after == before


def test_ivf_build_with_trained_codebook(spark, emb, tmp_path):
    """A caller-supplied (trained) codebook slots into the same layout:
    probe/append semantics are unchanged — full probe over the custom
    codebook equals the exact tier, and appends assign against the
    persisted custom centroids."""
    path = str(tmp_path / "ivf_trained")
    # stand-in "trained" codebook: 4 corpus vectors as centroids
    cents = (
        emb.filter(F.col("vec_id").isin([10, 20, 30, 40]))
        .select(
            ((F.col("vec_id") / 10).cast("int") - 1).alias("cell_id"),
            F.col("nvec").alias("centroid"),
        )
    )
    ivf_build(
        emb.filter(F.col("vec_id") < SPLIT), path, n_cells=4, centroids=cents
    )
    ivf_append(spark, path, emb.filter(F.col("vec_id") >= SPLIT))
    q = _norm_q(emb, 7)
    want = [
        (r.vec_id, r.distance)
        for r in knn_single(emb, q, k=10, normalize_query=False).collect()
    ]
    # full probe (nprobe = all 4 cells) must equal exact over the union
    got = [
        (r.vec_id, r.distance)
        for r in ivf_probe(spark, path, q, k=10, nprobe=4).collect()
    ]
    assert got == want
    # every vector landed in one of the custom cells
    cells = spark.read.parquet(f"{path}/cells")
    assert cells.count() == emb.count()
    assert cells.filter(~F.col("cell_id").isin([0, 1, 2, 3])).count() == 0


def test_ivf_delete_then_vacuum_lifecycle(spark, emb, tmp_path):
    """Tombstone delete hides ids immediately without touching resident
    files; vacuum rewrites ONLY the touched cell partitions (and the
    code table), drops the tombstones, and leaves probe results
    unchanged."""
    from cnc_visionsearch_spark.operators.ann import ivf_delete, ivf_vacuum

    path = str(tmp_path / "ivf_del")
    ivf_build(emb, path, n_cells=8)
    pq_build(spark, path, m=8)
    q = _norm_q(emb, 3)
    pre = [r.vec_id for r in ivf_probe(spark, path, q, k=10, nprobe=8).collect()]
    assert pre[0] == 3  # self-match present before the delete

    files_before = _file_md5s(f"{path}/cells")
    ivf_delete(spark, path, [3, 17, 23])
    files_after = _file_md5s(f"{path}/cells")
    assert files_after == files_before  # delete touches no resident file

    post = [r.vec_id for r in ivf_probe(spark, path, q, k=10, nprobe=8).collect()]
    assert 3 not in post and 17 not in post and 23 not in post
    # full-probe semantics: post == pre minus deleted, refilled from rank 11+
    want = [
        r.vec_id
        for r in knn_single(
            emb.filter(~F.col("vec_id").isin([3, 17, 23])), q, k=10,
            normalize_query=False,
        ).collect()
    ]
    assert post == want

    # vacuum: tombstones gone, untouched cells byte-identical, results same
    deleted_cells = {
        r.cell_id
        for r in spark.read.parquet(f"{path}/cells")
        .filter(F.col("vec_id").isin([3, 17, 23]))
        .select("cell_id")
        .collect()
    }
    ivf_vacuum(spark, path)
    assert not os.path.exists(f"{path}/tombstones")
    files_vac = _file_md5s(f"{path}/cells")
    for rel, digest in files_before.items():
        cell = rel.split("/")[0]
        if int(cell.split("=")[1]) not in deleted_cells:
            assert files_vac.get(rel) == digest, f"untouched cell rewritten: {rel}"
    after_vac = [
        r.vec_id for r in ivf_probe(spark, path, q, k=10, nprobe=8).collect()
    ]
    assert after_vac == post
    # physically gone from cells AND pq_codes
    assert (
        spark.read.parquet(f"{path}/cells")
        .filter(F.col("vec_id").isin([3, 17, 23]))
        .count()
        == 0
    )
    assert (
        spark.read.parquet(f"{path}/pq_codes")
        .filter(F.col("vec_id").isin([3, 17, 23]))
        .count()
        == 0
    )


def test_streaming_deletes_then_maintenance_runbook(spark, emb, tmp_path):
    """End-to-end operational lifecycle: appends accrete files, a
    delete stream tombstones ids, run_index_maintenance vacuums +
    compacts + audits — probe results match the exact tier minus
    deletes throughout, and a second maintenance run is a no-op."""
    from cnc_visionsearch_spark.maintenance import run_index_maintenance
    from cnc_visionsearch_spark.streaming.pipelines import ivf_delete_stream

    path = str(tmp_path / "ivf")
    ivf_build(emb.filter(F.col("vec_id") < 300), path, n_cells=8)
    pq_build(spark, path, m=8)
    for lo in (300, 400):
        ivf_append(
            spark, path,
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 100)),
        )

    # stream two delete drops
    drops = os.path.join(str(tmp_path), "del_drops")
    os.makedirs(drops)
    for i, ids in enumerate([[3, 17], [23]]):
        spark.createDataFrame([(v,) for v in ids], "vec_id bigint").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(str(tmp_path), f"d{i}"))
        src = [
            f
            for f in os.listdir(os.path.join(str(tmp_path), f"d{i}"))
            if f.endswith(".parquet")
        ][0]
        os.rename(
            os.path.join(str(tmp_path), f"d{i}", src),
            os.path.join(drops, f"drop_{i}.parquet"),
        )
    q = ivf_delete_stream(
        spark, drops, path, os.path.join(str(tmp_path), "ckpt")
    ).start()
    q.awaitTermination(120)

    qv = _norm_q(emb, 3)
    want = [
        (r.vec_id, r.distance)
        for r in knn_single(
            emb.filter(~F.col("vec_id").isin([3, 17, 23])), qv, k=10,
            normalize_query=False,
        ).collect()
    ]
    got = [
        (r.vec_id, r.distance)
        for r in ivf_probe(spark, path, qv, k=10, nprobe=8).collect()
    ]
    assert got == want

    report = run_index_maintenance(spark, index_path=path)
    assert report["vacuum_applied"] is True
    assert report["cells_files"]["after"] < report["cells_files"]["before"]
    assert not os.path.exists(f"{path}/tombstones")
    assert "recommend_retrain" in report and report["skew_ratio"] >= 1.0
    after = [
        (r.vec_id, r.distance)
        for r in ivf_probe(spark, path, qv, k=10, nprobe=8).collect()
    ]
    assert after == want  # maintenance never changes results

    report2 = run_index_maintenance(spark, index_path=path)
    assert report2["vacuum_applied"] is False  # idempotent: settled layout
    assert (
        report2["cells_files"]["after"] == report2["cells_files"]["before"]
        or report2["cells_files"]["after"] <= report["cells_files"]["after"]
    )


def test_shard_delete_then_vacuum(spark, emb, tmp_path):
    """Shard-tier delete lifecycle: tombstones exclude ids from the
    exact-merge probe immediately (filter-before-search), vacuum
    rewrites only touched shard partitions and drops tombstones,
    results unchanged."""
    from cnc_visionsearch_spark.operators.ann import shard_delete, shard_vacuum

    path = str(tmp_path / "sh_del")
    shard_build(emb, path, num_shards=8)
    before = _file_md5s(f"{path}/shards")
    shard_delete(spark, path, [9, 11])
    assert _file_md5s(f"{path}/shards") == before  # no resident rewrite

    q = _norm_q(emb, 9)
    want = [
        (r.vec_id, r.distance)
        for r in knn_single(
            emb.filter(~F.col("vec_id").isin([9, 11])), q, k=10,
            normalize_query=False,
        ).collect()
    ]
    got = [
        (r.vec_id, r.distance)
        for r in sharded_topk_persisted(spark, path, q, k=10).collect()
    ]
    assert got == want

    shard_vacuum(spark, path)
    assert not os.path.exists(f"{path}/tombstones")
    after = [
        (r.vec_id, r.distance)
        for r in sharded_topk_persisted(spark, path, q, k=10).collect()
    ]
    assert after == want
    # untouched shard partitions byte-identical (9 % 8 = 1, 11 % 8 = 3)
    vac = _file_md5s(f"{path}/shards")
    for rel, digest in before.items():
        shard = rel.split("/")[0]
        if shard not in ("shard=1", "shard=3"):
            assert vac.get(rel) == digest, f"untouched shard rewritten: {rel}"
    assert (
        spark.read.parquet(f"{path}/shards")
        .filter(F.col("vec_id").isin([9, 11]))
        .count()
        == 0
    )


def test_maintenance_second_run_is_true_noop(spark, emb, tmp_path):
    """A settled layout (<=1 file per partition, no tombstones) must
    pass through maintenance byte-identically — no same-content file
    churn."""
    from cnc_visionsearch_spark.maintenance import run_index_maintenance

    path = str(tmp_path / "ivf")
    ivf_build(emb, path, n_cells=8)
    run_index_maintenance(spark, index_path=path)
    settled = _file_md5s(f"{path}/cells")
    report = run_index_maintenance(spark, index_path=path)
    assert report["vacuum_applied"] is False
    assert _file_md5s(f"{path}/cells") == settled


def test_deletes_honored_by_every_probe_path(spark, monkeypatch, tmp_path):
    """A tombstone delete must be invisible to NO probe path of the
    layout: the plain IVF probe, the composed ADC/int8 probes, and the
    batch knn-join all read through the tombstone filter. Runs against
    a private artifact root so the shared build cache is untouched."""
    import cnc_visionsearch_spark.queries_ann as qa
    from cnc_visionsearch_spark.operators.ann import ivf_delete
    from cnc_visionsearch_spark.registry import all_queries

    monkeypatch.setattr(qa, "_ARTIFACT_ROOT", str(tmp_path / "artifacts"))
    qs = all_queries()
    probes = {
        "ann_ivf_topk": 3,
        "ann_pq_adc_topk": 7,
        "ann_ivf_int8_topk": 3,
        "ann_ivf_pq_topk": 11,
    }
    base = {
        name: [r.vec_id for r in qs[name](spark, SF).collect()]
        for name in probes
    }
    join_base = {
        (r.qid, r.vec_id) for r in qs["ann_ivf_knn_join"](spark, SF).collect()
    }
    # delete each probe's SELF-MATCH id (rank-1 result) plus a join hit
    victim_ids = sorted(set(probes.values()) | {2})
    path = qa.ensure_ivf_built(spark, SF, n_cells=8)
    ivf_delete(spark, path, victim_ids)

    for name, qid in probes.items():
        got = [r.vec_id for r in qs[name](spark, SF).collect()]
        assert qid not in got, f"{name} resurrected deleted id {qid}"
        assert len(got) == 10, f"{name} starved after delete: {len(got)}"
        assert got != base[name]
    join_got = {
        (r.qid, r.vec_id) for r in qs["ann_ivf_knn_join"](spark, SF).collect()
    }
    assert all(v not in {v2 for _, v2 in join_got} for v in victim_ids)
    assert join_got != join_base


# --------------------------------------------------- hot-cell rebalance


class TestIvfRebalance:
    def _build(self, spark, emb, tmp_path, n_cells=6):
        path = str(tmp_path / "ivf_rebal")
        ivf_build(emb.filter(F.col("vec_id") < 200), path, n_cells=n_cells)
        return path

    def test_member_union_preserved_and_probe_identical(
        self, spark, emb, tmp_path
    ):
        from cnc_visionsearch_spark.operators.ann import ivf_rebalance

        path = self._build(spark, emb, tmp_path)
        before = sorted(
            (int(r["vec_id"]),)
            for r in spark.read.parquet(f"{path}/cells").select("vec_id").collect()
        )
        q = _norm_q(emb, 7)
        full_before = [
            (int(r["vec_id"]), float(r["distance"]))
            for r in ivf_probe(spark, path, q, k=10, nprobe=100).collect()
        ]
        report = ivf_rebalance(spark, path, max_splits=1, min_factor=0.0)
        assert len(report) == 1
        r = report[0]
        assert not os.path.exists(
            os.path.join(path, "cells", f"cell_id={r['cell_id']}")
        )
        after = sorted(
            (int(x["vec_id"]),)
            for x in spark.read.parquet(f"{path}/cells").select("vec_id").collect()
        )
        assert before == after  # the union of members never changes
        # full-coverage probe (every cell probed) is bit-identical
        full_after = [
            (int(x["vec_id"]), float(x["distance"]))
            for x in ivf_probe(spark, path, q, k=10, nprobe=100).collect()
        ]
        assert full_before == full_after
        # codebook swapped: parent gone, both children present
        cb_ids = {
            int(x["cell_id"])
            for x in spark.read.parquet(f"{path}/codebook").collect()
        }
        assert r["cell_id"] not in cb_ids
        assert {r["lo_cell"], r["hi_cell"]} <= cb_ids
        assert read_geometry(path)["n_cells"] == 7

    def test_untouched_partitions_stay_byte_identical(
        self, spark, emb, tmp_path
    ):
        from cnc_visionsearch_spark.operators.ann import ivf_rebalance

        path = self._build(spark, emb, tmp_path)
        pre = _file_md5s(os.path.join(path, "cells"))
        report = ivf_rebalance(spark, path, max_splits=1, min_factor=0.0)
        parent = f"cell_id={report[0]['cell_id']}"
        post = _file_md5s(os.path.join(path, "cells"))
        untouched_pre = {k: v for k, v in pre.items() if not k.startswith(parent)}
        assert {
            k: v for k, v in post.items() if k in untouched_pre
        } == untouched_pre

    def test_crash_self_heal_restores_parent(self, spark, emb, tmp_path):
        """Simulate death mid-swap (journal written, parent renamed to
        .bak, children not landed): the next call must restore the
        parent and proceed to a clean split."""
        import json as _json
        import shutil

        from cnc_visionsearch_spark.operators.ann import ivf_rebalance

        path = self._build(spark, emb, tmp_path)
        sizes = {
            int(r["cell_id"]): int(r["n"])
            for r in spark.read.parquet(f"{path}/cells")
            .groupBy("cell_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        hot = max(sorted(sizes), key=lambda c: sizes[c])
        parent = os.path.join(path, "cells", f"cell_id={hot}")
        os.rename(parent, parent + ".bak")
        with open(os.path.join(path, "_REBALANCE_INPROGRESS.json"), "w") as fh:
            _json.dump({"cell_id": hot, "lo_cell": 90, "hi_cell": 91}, fh)
        report = ivf_rebalance(spark, path, max_splits=1, min_factor=0.0)
        # healed (parent restored) then split normally
        assert len(report) == 1
        assert not os.path.exists(parent + ".bak")
        assert not os.path.exists(
            os.path.join(path, "_REBALANCE_INPROGRESS.json")
        )
        n_total = spark.read.parquet(f"{path}/cells").count()
        assert n_total == 200

    def test_radii_refreshed_for_children_only(self, spark, emb, tmp_path):
        from cnc_visionsearch_spark.operators.ann import (
            ivf_cell_radii,
            ivf_rebalance,
        )

        path = self._build(spark, emb, tmp_path)
        report = ivf_rebalance(spark, path, max_splits=1, min_factor=0.0)
        r = report[0]
        radii = {
            int(x["cell_id"]): float(x["radius"])
            for x in ivf_cell_radii(spark, path).collect()
        }
        assert r["cell_id"] not in radii
        assert r["lo_cell"] in radii and r["hi_cell"] in radii
        # children radii match a from-scratch recompute of the layout
        from cnc_visionsearch_spark.operators.ann import _compute_cell_radii

        fresh = {
            int(x["cell_id"]): float(x["radius"])
            for x in _compute_cell_radii(spark, path).collect()
        }
        assert radii == fresh


    def test_crash_after_kids_heals_codebook(self, spark, emb, tmp_path):
        """Simulate death AFTER the children partitions landed but
        BEFORE the codebook swap (journal still on disk, codebook
        still carries the parent): the next call must repair the
        codebook from the children — otherwise the split data would be
        invisible to probes forever."""
        import json as _json
        import shutil

        from cnc_visionsearch_spark.operators.ann import (
            ivf_probe,
            ivf_rebalance,
        )

        path = self._build(spark, emb, tmp_path)
        report = ivf_rebalance(spark, path, max_splits=1, min_factor=0.0)
        r = report[0]
        # rewind the codebook to its pre-split state (parent in,
        # children out) and resurrect the journal — the crash window
        cb = spark.read.parquet(f"{path}/codebook").collect()
        kid_rows = [x for x in cb if int(x["cell_id"]) in (r["lo_cell"], r["hi_cell"])]
        assert len(kid_rows) == 2
        lo_seed = [
            float(v)
            for v in next(
                x["centroid"] for x in kid_rows if int(x["cell_id"]) == r["lo_cell"]
            )
        ]
        old_rows = [
            (int(x["cell_id"]), [float(v) for v in x["centroid"]])
            for x in cb
            if int(x["cell_id"]) not in (r["lo_cell"], r["hi_cell"])
        ] + [(r["cell_id"], lo_seed)]
        spark.createDataFrame(
            old_rows, "cell_id int, centroid array<double>"
        ).write.mode("overwrite").parquet(f"{path}/codebook.tmp")
        shutil.rmtree(f"{path}/codebook")
        os.rename(f"{path}/codebook.tmp", f"{path}/codebook")
        with open(os.path.join(path, "_REBALANCE_INPROGRESS.json"), "w") as fh:
            _json.dump(
                {
                    "cell_id": r["cell_id"],
                    "lo_cell": r["lo_cell"],
                    "hi_cell": r["hi_cell"],
                },
                fh,
            )
        # next entry heals: codebook swapped, probes see every member
        ivf_rebalance(spark, path, max_splits=0, min_factor=0.0)
        cb_ids = {
            int(x["cell_id"])
            for x in spark.read.parquet(f"{path}/codebook").collect()
        }
        assert r["cell_id"] not in cb_ids
        assert {r["lo_cell"], r["hi_cell"]} <= cb_ids
        q = _norm_q(emb, 7)
        assert len(ivf_probe(spark, path, q, k=10, nprobe=100).collect()) == 10
        assert not os.path.exists(
            os.path.join(path, "_REBALANCE_INPROGRESS.json")
        )


# ------------------------------------------------ forget-vectors runbook


def test_forget_vectors_runbook_is_idempotent_and_composes(
    spark, emb, tmp_path
):
    """One forget_vectors call darkens the ids on every layout it is
    given; re-running (the compliance-queue retry path) changes
    nothing further; vacuum afterwards makes removal physical."""
    from cnc_visionsearch_spark.maintenance import forget_vectors
    from cnc_visionsearch_spark.operators.ann import (
        _without_tombstones,
        ivf_build,
        ivf_probe,
        ivf_vacuum,
        shard_build,
        sharded_topk_persisted,
    )

    sub = emb.filter(F.col("vec_id") < 100)
    p_ivf = str(tmp_path / "f_ivf")
    p_sh = str(tmp_path / "f_sh")
    ivf_build(sub, p_ivf, n_cells=4)
    shard_build(sub, p_sh, num_shards=4)
    q = _norm_q(emb, 7)
    pre = {int(r["vec_id"]) for r in ivf_probe(spark, p_ivf, q, k=5, nprobe=10).collect()}
    victim = sorted(pre - {7})[:2]
    rep = forget_vectors(spark, victim, ivf_paths=(p_ivf,), shard_paths=(p_sh,))
    assert set(rep) == {p_ivf, p_sh}
    for probe in (
        ivf_probe(spark, p_ivf, q, k=5, nprobe=10),
        sharded_topk_persisted(spark, p_sh, q, k=5),
    ):
        got = {int(r["vec_id"]) for r in probe.collect()}
        assert not (got & set(victim))
    # idempotent retry: live census unchanged after a second run
    n1 = _without_tombstones(
        spark, p_ivf, spark.read.parquet(f"{p_ivf}/cells"), "vec_id"
    ).count()
    forget_vectors(spark, victim, ivf_paths=(p_ivf,), shard_paths=(p_sh,))
    n2 = _without_tombstones(
        spark, p_ivf, spark.read.parquet(f"{p_ivf}/cells"), "vec_id"
    ).count()
    assert n1 == n2 == 98
    # physical removal rides the normal vacuum
    ivf_vacuum(spark, p_ivf)
    assert spark.read.parquet(f"{p_ivf}/cells").count() == 98
    assert not __import__("os").path.exists(f"{p_ivf}/tombstones")


# ------------------------------------------- exact pruned search


def test_exact_pruned_search_equals_brute_force(spark, emb, tmp_path):
    """The triangle-inequality walk must be BIT-identical to brute
    force for every query — exactness is the operator's contract, not
    a recall gate."""
    from cnc_visionsearch_spark.operators.ann import ivf_exact_pruned_search

    sub = emb.filter(F.col("vec_id") < 200)
    path = str(tmp_path / "xp_ivf")
    ivf_build(sub, path, n_cells=6)
    for qid in (3, 55, 111):
        q = _norm_q(emb, qid)
        exact = [
            (int(r["vec_id"]), float(r["distance"]))
            for r in knn_single(sub, q, k=10, normalize_query=False).collect()
        ]
        got, scanned = ivf_exact_pruned_search(spark, path, q, k=10)
        assert got == exact
        assert 1 <= len(scanned) <= 6
    # k=1 with a resident query vector: the d=0 self-match is a
    # stopping certificate the moment its cell is reached (cells with
    # a zero lower bound ahead of it in the walk still scan), so the
    # walk must genuinely prune — strictly fewer than all cells
    q = _norm_q(emb, 55)
    top, scanned = ivf_exact_pruned_search(spark, path, q, k=1)
    assert top[0][0] == 55 and top[0][1] == 0.0
    assert len(scanned) < 6

