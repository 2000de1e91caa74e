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

At 100 TB the build step would generate candidate edges with the
IVF-pruned batch join (operators.ann.ivf_knn_join_probe) instead of
the exact pair join used here for oracle parity; the graph layout,
append path, and search are unchanged by that swap.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cnc_visionsearch_spark.functions.vector import l2_sq
from cnc_visionsearch_spark.operators.ann import _metadata_rows, _seq_l2_sq

__all__ = ["nsw_build", "nsw_append", "nsw_search", "nsw_search_df"]


def _meta(path: str) -> dict:
    with open(os.path.join(path, "_NSW.json")) as fh:
        return json.load(fh)


def nsw_build(
    emb: DataFrame,
    path: str,
    m: int = 12,
    n_buckets: int = 16,
    n_entries: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "nvec",
) -> None:
    """Materialize the NSW layout at ``path``: the exact top-``m``
    neighbor graph (one shuffle: the per-src window rank), destination
    vectors denormalized into edge rows, partitioned by
    ``src % n_buckets``; plus ``{path}/entries`` — the ``n_entries``
    smallest ids with their vectors, the fixed search entry points
    (metadata-sized, read driver-side like the IVF codebook)."""
    a = emb.select(F.col(id_col).alias("src"), F.col(vec_col).alias("svec"))
    b = emb.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("dvec"))
    w = Window.partitionBy("src").orderBy(F.col("gd").asc(), F.col("dst").asc())
    graph = (
        a.join(b, F.col("src") != F.col("dst"))
        .withColumn("gd", l2_sq("svec", "dvec"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= m)
        .select(
            "src",
            "dst",
            "dvec",
            F.pmod(F.col("src"), F.lit(n_buckets)).alias("src_bucket"),
        )
    )
    graph.write.mode("overwrite").partitionBy("src_bucket").parquet(
        f"{path}/graph"
    )
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
