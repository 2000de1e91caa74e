"""Graph-ANN (NSW) queries — hash-gated beam search over the persisted
kNN-graph layout (operators/graph_ann.py), the Spark re-expression of
the reference's HNSW index (main.py:28-31,60-62: IndexHNSWFlat M=32,
efSearch=300).

Both queries are ORACLE-REPLAYED end to end: the DuckDB side rebuilds
the exact top-m neighbor graph as a ranked pair join and replays every
beam-search hop as an unrolled CTE (candidates = beam ∪ neighbors,
keep top-ef by (distance, id)), so the hash gate covers the graph
build, the entry points, the hop expansion, AND the final ranking —
not just the result shape. Recall-vs-exact gates live in
tests/test_ann_graph.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cnc_visionsearch_spark.operators.graph_ann import nsw_build, nsw_search_df
from cnc_visionsearch_spark.operators.knn import with_normalized
from cnc_visionsearch_spark.queries_ann import (
    _ARTIFACT_ROOT,
    _L2SQ,
    _NORM_CTE,
    _corpus_tag,
    _norm_query_vec,
)
from cnc_visionsearch_spark.registry import register
from cnc_visionsearch_spark.sources.catalog import load_table

# Defaults chosen from the measured sweep (RECALL.json nsw_ef_sweep):
# m=12/ef=24/hops=6 reaches recall@10 = 1.0 (mean AND min) on the sf0.1
# fixture — the graph-tier analog of the reference's M=32/efSearch=300
# meeting BASELINE.md's >= 0.95 gate at its default knobs.
_M = 12  # graph out-degree (reference M=32, main.py:30)
_EF = 24  # beam width (reference efSearch=300, main.py:31)
_HOPS = 6
_ENTRIES = 4
_QID = 5  # query vector, same convention as the other ANN tiers


def ensure_nsw_built(spark: SparkSession, sf_dir: str, m: int = _M) -> str:
    """Idempotent NSW build: graph + entries artifacts once per
    (corpus content, m); returns the layout path."""
    path = f"{_ARTIFACT_ROOT}/{_corpus_tag(sf_dir)}/nsw_m{m}"
    if not os.path.exists(os.path.join(path, "_BUILT")):
        emb = with_normalized(load_table(spark, sf_dir, "embeddings")).select(
            "vec_id", "nvec"
        )
        nsw_build(emb, path, m=m, n_entries=_ENTRIES)
        open(os.path.join(path, "_BUILT"), "w").close()
    return path


_GRAPH_CTE = f"""
pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst, b.nvec AS dvec,
    {_L2SQ.format(a="a.nvec", b="b.nvec")} AS gd
  FROM normed a, normed b WHERE a.vec_id <> b.vec_id
),
graph AS (
  SELECT src, dst, dvec FROM (
    SELECT src, dst, dvec,
      ROW_NUMBER() OVER (PARTITION BY src ORDER BY gd ASC, dst ASC) AS rn
    FROM pairs
  ) r WHERE rn <= {_M}
)
"""


def _beam_ctes(hops: int, ef: int) -> str:
    """Unrolled beam-search CTE chain b0 -> c1/b1 -> ... -> b{hops}."""
    parts = [
        f"""
b0 AS (
  SELECT vec_id AS id, {_L2SQ.format(a="nvec", b="qvec")} AS d
  FROM normed, q
  WHERE vec_id IN (SELECT vec_id FROM normed ORDER BY vec_id LIMIT {_ENTRIES})
)"""
    ]
    for i in range(1, hops + 1):
        parts.append(
            f"""
c{i} AS (
  SELECT id, d FROM b{i - 1}
  UNION
  SELECT g.dst AS id, {_L2SQ.format(a="g.dvec", b="qvec")} AS d
  FROM graph g, q WHERE g.src IN (SELECT id FROM b{i - 1})
),
b{i} AS (SELECT id, d FROM c{i} ORDER BY d ASC, id ASC LIMIT {ef})"""
        )
    return ",".join(parts)


@register(
    "ann_nsw_degree_histogram",
    oracle=f"""
WITH {_NORM_CTE}, {_GRAPH_CTE}
SELECT CAST(src AS BIGINT) AS src, CAST(count(*) AS BIGINT) AS degree
FROM graph GROUP BY src ORDER BY src LIMIT 50
""",
    doc="NSW build audit: out-degree per node of the persisted exact "
    "top-m neighbor graph (first 50 nodes) — hash-matching the oracle's "
    "ranked pair join proves the persisted adjacency (edge set AND "
    "tie-breaks) is exactly the declared graph, the invariant every "
    "beam search leans on.",
)
def ann_nsw_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = ensure_nsw_built(spark, sf_dir)
    return (
        spark.read.parquet(f"{path}/graph")
        .groupBy(F.col("src").cast("bigint").alias("src"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy("src")
        .limit(50)
    )


@register(
    "ann_nsw_beam_topk",
    oracle=f"""
WITH {_NORM_CTE},
q AS (SELECT nvec AS qvec FROM normed WHERE vec_id = {_QID}),
{_GRAPH_CTE},
{_beam_ctes(_HOPS, _EF)}
SELECT CAST(id AS BIGINT) AS vec_id, d AS distance
FROM b{_HOPS} ORDER BY distance ASC, vec_id ASC LIMIT 10
""",
    doc="NSW beam-search top-10 over the persisted graph layout — the "
    "Spark analog of the reference's HNSW search (main.py:155): fixed "
    f"entry points (smallest ids, persisted at build), {_HOPS} hops, "
    f"beam ef={_EF} (measured recall@10 = 1.0 at these defaults, "
    "RECALL.json), each hop ONE partition-pruned scan of the beam's buckets "
    "scoring denormalized neighbor vectors with the exact codegen "
    "fold. The oracle replays the whole search as unrolled CTEs, so "
    "approximate != unverifiable: the hash gate pins every hop.",
)
def ann_nsw_beam_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = ensure_nsw_built(spark, sf_dir)
    q = _norm_query_vec(spark, sf_dir, _QID)
    return nsw_search_df(spark, path, q, k=10, ef=_EF, hops=_HOPS)
