"""Graph-ANN tier: a navigable-small-world (NSW) index re-expressed
for Spark — the closest Spark-native analog of the reference's actual
index structure (faiss.IndexHNSWFlat, M=32, efSearch=300,
/root/reference/main.py:28-31,60-62).

HNSW is a pointer-chasing, single-process structure; it cannot hold a
100 TB corpus in RAM. The re-expression keeps its two load-bearing
ideas — a bounded-degree kNN graph and greedy beam search — and maps
each to a Spark-scale primitive:

- **Graph = a bucket-partitioned parquet table.** One row per directed
  edge ``(src, dst, dvec)`` with the destination vector DENORMALIZED
  into the edge row (HNSW equally stores vectors adjacent to the
  adjacency lists) and partitioned by ``src_bucket = src % n_buckets``.
  A hop therefore reads only the beam's buckets — partition pruning is
  the distributed analog of following in-RAM pointers.
- **Search = H beam-search hops, each ONE pruned scan.** The beam is a
  query-planner value (≤ ef rows, like the probe-cell list of the IVF
  tier), so per hop the driver prunes buckets, scans ≤ |beam| · m edge
  rows, scores ``dvec`` with the exact codegen fold, and keeps the
  top-ef. No shuffle anywhere; the scan IS the candidate generator.

Determinism: the graph is the EXACT top-m neighbor graph (ties by
dst), entry points are the ``n_entries`` smallest vec_ids (persisted as
a metadata artifact at build), and every distance on every engine is
the same sequential fold — so beam search replays exactly in SQL as
unrolled CTEs and the registered query is hash-gated even though the
search itself is approximate (recall gates live in
tests/test_ann_graph.py).

At 100 TB the build step generates candidate edges with the
IVF-pruned batch join (``nsw_build(..., candidates="ivf")`` routes the
whole corpus through operators.ann.ivf_knn_join_probe with
``broadcast_probes=False``): per-vector candidates are the nprobe
nearest IVF cells — O(n · nprobe · avg_cell) instead of the O(n²)
exact pair join, which remains available as ``candidates="exact"``
for oracle parity at fixture scale. With ``ivf_nprobe >= n_cells`` the
two modes produce the IDENTICAL graph (every cell probed ⇒ the pruned
candidate set is the whole corpus); the graph layout, append path, and
search are unchanged by the swap.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cnc_visionsearch_spark.functions.vector import l2_sq
from cnc_visionsearch_spark.operators.ann import _metadata_rows, _seq_l2_sq

__all__ = [
    "nsw_build",
    "nsw_candidate_edges",
    "nsw_append",
    "nsw_search",
    "nsw_search_df",
]


def _meta(path: str) -> dict:
    with open(os.path.join(path, "_NSW.json")) as fh:
        return json.load(fh)


def nsw_candidate_edges(
    emb: DataFrame,
    m: int,
    candidates: str = "exact",
    ivf_path: str | None = None,
    ivf_nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "nvec",
) -> DataFrame:
    """The build's candidate generator: per-src exact top-``m``
    ``(src, dst, dvec)`` edges over either candidate set.

    ``candidates="exact"`` — the O(n²) pair join (fixture-scale oracle
    parity: this IS the graph the DuckDB oracle rebuilds).
    ``candidates="ivf"`` — the 100 TB shape: every vector probes the
    ``ivf_nprobe`` nearest cells of the persisted IVF layout at
    ``ivf_path`` through :func:`~cnc_visionsearch_spark.operators.ann.
    ivf_knn_join_probe` (``broadcast_probes=False`` — the probe set is
    the corpus, it must equi-join on cell_id, never broadcast), then
    exact top-m rank on the pruned candidate set. Cost is
    O(n · nprobe · avg_cell); no corpus×corpus join exists in the plan
    (pinned by tests/test_ann_graph.py). With ``ivf_nprobe >= n_cells``
    the candidate set is total, so the result is bit-identical to the
    exact mode."""
    if candidates == "exact":
        a = emb.select(F.col(id_col).alias("src"), F.col(vec_col).alias("svec"))
        b = emb.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("dvec"))
        w = Window.partitionBy("src").orderBy(
            F.col("gd").asc(), F.col("dst").asc()
        )
        return (
            a.join(b, F.col("src") != F.col("dst"))
            .withColumn("gd", l2_sq("svec", "dvec"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= m)
            .select("src", "dst", "dvec")
        )
    if candidates != "ivf":
        raise ValueError(f"candidates must be 'exact' or 'ivf', got {candidates!r}")
    if ivf_path is None:
        raise ValueError("candidates='ivf' requires ivf_path")
    from cnc_visionsearch_spark.operators.ann import ivf_knn_join_probe

    spark = emb.sparkSession
    qs = emb.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    # k=m+1: the self-match (distance 0, own cell is always probed
    # first) occupies one slot; drop it, then exact top-m re-rank on
    # the pruned candidates (covers the rare self-not-in-top case).
    cand = ivf_knn_join_probe(
        spark,
        ivf_path,
        qs,
        k=m + 1,
        nprobe=ivf_nprobe,
        id_col=id_col,
        vec_col=vec_col,
        broadcast_probes=False,
    ).filter(F.col("qid") != F.col(id_col))
    w = Window.partitionBy("qid").orderBy(
        F.col("distance").asc(), F.col(id_col).asc()
    )
    edges = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= m)
        .select(F.col("qid").alias("src"), F.col(id_col).alias("dst"))
    )
    # denormalize the destination vectors — a plain dst equi-join of
    # n·m narrow rows against the corpus, the layout's HNSW-style
    # "vectors live next to the adjacency lists" invariant
    b = emb.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("dvec"))
    return edges.join(b, "dst").select("src", "dst", "dvec")


def nsw_build(
    emb: DataFrame,
    path: str,
    m: int = 12,
    n_buckets: int = 16,
    n_entries: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "nvec",
    candidates: str = "exact",
    ivf_path: str | None = None,
    ivf_cells: int = 8,
    ivf_nprobe: int = 4,
) -> None:
    """Materialize the NSW layout at ``path``: the per-src top-``m``
    neighbor graph (candidate set per ``candidates`` — see
    :func:`nsw_candidate_edges`; "exact" is the fixture-scale oracle-
    parity mode, "ivf" the 100 TB IVF-pruned mode), destination
    vectors denormalized into edge rows, partitioned by
    ``src % n_buckets``; plus ``{path}/entries`` — the ``n_entries``
    smallest ids with their vectors, the fixed search entry points
    (metadata-sized, read driver-side like the IVF codebook).

    In ivf mode, ``ivf_path`` reuses an existing
    :func:`~cnc_visionsearch_spark.operators.ann.ivf_build` layout
    (the production shape: the corpus already has one); when omitted a
    transient ``ivf_cells``-cell layout is built under ``path`` and
    removed after the graph is written."""
    transient_ivf = None
    if candidates == "ivf" and ivf_path is None:
        from cnc_visionsearch_spark.operators.ann import ivf_build

        transient_ivf = ivf_path = os.path.join(path, "_build_ivf")
        ivf_build(emb, ivf_path, n_cells=ivf_cells, id_col=id_col, vec_col=vec_col)
    graph = nsw_candidate_edges(
        emb,
        m,
        candidates=candidates,
        ivf_path=ivf_path,
        ivf_nprobe=ivf_nprobe,
        id_col=id_col,
        vec_col=vec_col,
    ).select(
        "src",
        "dst",
        "dvec",
        F.pmod(F.col("src"), F.lit(n_buckets)).alias("src_bucket"),
    )
    graph.write.mode("overwrite").partitionBy("src_bucket").parquet(
        f"{path}/graph"
    )
    if transient_ivf is not None:
        import shutil

        shutil.rmtree(transient_ivf, ignore_errors=True)
    (
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("nvec"))
        .orderBy("vec_id")
        .limit(n_entries)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/entries")
    )
    with open(os.path.join(path, "_NSW.json"), "w") as fh:
        json.dump(
            {"m": m, "n_buckets": n_buckets, "n_entries": n_entries}, fh
        )


def nsw_append(spark, path: str, new_emb: DataFrame) -> None:
    """Incremental insert — the batch twin of HNSW's online ``add``:
    each new node gets out-edges to its m nearest EXISTING nodes (found
    by :func:`nsw_search_df`, i.e. through the index itself, exactly how
    HNSW inserts) plus BACK-edges from those neighbors, so new nodes
    are reachable by later searches. Both edge sets append into the
    bucket-partitioned layout — existing files stay byte-identical; a
    touched src may temporarily exceed degree m (search correctness
    only widens; periodic :func:`nsw_build` re-trims). O(batch), never
    a corpus rescan."""
    meta = _meta(path)
    m, n_buckets = meta["m"], meta["n_buckets"]
    new_rows = new_emb.select("vec_id", "nvec").collect()
    out, back = [], []
    for r in new_rows:
        nvec = [float(x) for x in r.nvec]
        nbrs = nsw_search(spark, path, nvec, k=m, ef=4 * m)
        for nb_id, _nb_d in nbrs:
            out.append((int(r.vec_id), int(nb_id)))
            back.append((int(nb_id), int(r.vec_id), nvec))
    # out-edges need the neighbor vectors denormalized: fetch them in
    # one bounded pruned read (≤ batch·m distinct ids)
    nbr_ids = sorted({dst for _, dst in out})
    nbr_vec = {
        int(x["dst"]): x["dvec"]
        for x in spark.read.parquet(f"{path}/graph")
        .filter(F.col("dst").isin(nbr_ids))
        .select("dst", "dvec")
        .dropDuplicates(["dst"])
        .collect()
    }
    # a search result is either some edge's dst (covered above) or one
    # of the fixed entry points — merge those from the entries artifact
    for e in _metadata_rows(f"{path}/entries"):
        nbr_vec.setdefault(int(e["vec_id"]), e["nvec"])
    rows = [
        (src, dst, [float(v) for v in nbr_vec[dst]], src % n_buckets)
        for src, dst in out
        if dst in nbr_vec
    ] + [(src, dst, dvec, src % n_buckets) for src, dst, dvec in back]
    schema = "src bigint, dst bigint, dvec array<double>, src_bucket int"
    spark.createDataFrame(rows, schema).write.mode("append").partitionBy(
        "src_bucket"
    ).parquet(f"{path}/graph")


def nsw_search(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    ef: int = 24,
    hops: int = 6,
) -> list[tuple[int, float]]:
    """Beam search over a :func:`nsw_build` layout; returns the top-k
    ``(vec_id, distance)``. Entry distances fold driver-side
    (sequential, bit-identical to the codegen fold); each hop is one
    partition-pruned scan of the beam's buckets scoring ≤ |beam|·m
    denormalized edge rows. The beam (≤ ef entries) is planner state,
    like the IVF probe-cell list."""
    meta = _meta(path)
    n_buckets = meta["n_buckets"]
    q = [float(x) for x in query_vec]
    beam: dict[int, float] = {
        int(r["vec_id"]): _seq_l2_sq(r["nvec"], q)
        for r in _metadata_rows(f"{path}/entries")
    }
    beam = dict(sorted(beam.items(), key=lambda kv: (kv[1], kv[0]))[:ef])
    qcol = F.array(*[F.lit(x) for x in q]).cast("array<double>")
    for _ in range(hops):
        ids = sorted(beam)
        buckets = sorted({i % n_buckets for i in ids})
        nbrs = (
            spark.read.parquet(f"{path}/graph")
            .filter(F.col("src_bucket").isin(buckets))
            .filter(F.col("src").isin(ids))
            .select("dst", l2_sq("dvec", qcol).alias("d"))
            .collect()
        )
        for r in nbrs:
            beam.setdefault(int(r.dst), float(r.d))
        beam = dict(sorted(beam.items(), key=lambda kv: (kv[1], kv[0]))[:ef])
    top = sorted(beam.items(), key=lambda kv: (kv[1], kv[0]))[:k]
    return [(i, d) for i, d in top]


def nsw_search_df(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    ef: int = 24,
    hops: int = 6,
) -> DataFrame:
    """:func:`nsw_search` as a (vec_id, distance) DataFrame — the
    registered-query surface."""
    rows = nsw_search(spark, path, query_vec, k=k, ef=ef, hops=hops)
    return spark.createDataFrame(
        [(int(i), float(d)) for i, d in rows],
        "vec_id bigint, distance double",
    )
