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


def ensure_tlog_nsw_built(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent TRANSACTIONAL NSW lifecycle (r10): the exact top-m
    edge set lands as TWO commits (an init holding the even-dst half +
    entries, then a blind append of the odd-dst half — every bucket
    ends up holding two files), followed by ONE nsw_compact rewrite
    commit under the optimistic loop. The final graph CONTENT equals a
    one-shot build by construction (same pure edge function, disjoint
    halves), so the beam-search oracle replays the whole lifecycle."""
    import shutil

    from cnc_visionsearch_spark.operators.graph_ann import (
        TLOG_NSW_ENTRIES_TAG,
        _retag_g,
        nsw_candidate_edges,
        nsw_compact,
    )
    from cnc_visionsearch_spark.sources.tlog import TLog, run_transaction

    path = f"{_ARTIFACT_ROOT}/{_corpus_tag(sf_dir)}/nsw_tlog_m{_M}"
    marker = os.path.join(path, "_HISTORY")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        emb = with_normalized(load_table(spark, sf_dir, "embeddings")).select(
            "vec_id", "nvec"
        )
        n_buckets = 16  # nsw_build's default — the oracle is bucket-blind
        edges = nsw_candidate_edges(emb, _M).select(
            "src",
            "dst",
            "dvec",
            F.pmod(F.col("src"), F.lit(n_buckets)).cast("int").alias(
                "src_bucket"
            ),
        )
        entries = (
            emb.select("vec_id", "nvec")
            .orderBy("vec_id")
            .limit(_ENTRIES)
            .coalesce(1)
        )
        # BARRIER before splitting (r10 advice): the even/odd halves
        # below must come from ONE evaluation of the candidate-edge
        # plan — re-evaluating a (future, possibly nondeterministic)
        # candidate generator per half could duplicate or lose edges
        # across the two commits. ContextCleaner-reclaimed, like the
        # maxsim/dedup candidate barriers.
        edges = edges.localCheckpoint(eager=False)
        t = TLog(path)
        adds = t.write_data(
            edges.filter(F.col("dst") % 2 == 0),
            bucket_expr=F.col("src_bucket"),
        )
        adds += _retag_g(t.write_data(entries), TLOG_NSW_ENTRIES_TAG)
        t.commit(
            adds=adds,
            op="append",
            meta={"kind": "nsw", "m": _M, "n_buckets": n_buckets},
            base_version=0,
        )
        t.commit(
            adds=t.write_data(
                edges.filter(F.col("dst") % 2 == 1),
                bucket_expr=F.col("src_bucket"),
            ),
            op="append",
        )
        import json as _json

        with open(os.path.join(path, "_NSW.json"), "w") as fh:
            _json.dump(
                {"m": _M, "n_buckets": n_buckets, "n_entries": _ENTRIES}, fh
            )
        run_transaction(lambda: nsw_compact(spark, path))
        open(marker, "w").close()
    return path


@register(
    "tlog_nsw_lifecycle_topk",
    oracle=f"""
WITH {_NORM_CTE},
q AS (SELECT nvec AS qvec FROM normed WHERE vec_id = {_QID}),
{_GRAPH_CTE},
{_beam_ctes(_HOPS, _EF)}
SELECT CAST(id AS BIGINT) AS vec_id, d AS distance
FROM b{_HOPS} ORDER BY distance ASC, vec_id ASC LIMIT 10
""",
    doc="NSW beam search over a TRANSACTIONAL graph layout after its "
    "full write lifecycle (r10 — the r9 scope exclusion 'a graph-ANN "
    "append racing a compact is still unarbitrated' closed): the "
    "exact top-m edge set lands as an init commit plus a BLIND append "
    "commit (every bucket holds two files), then nsw_compact rewrites "
    "every multi-file bucket as ONE commit declaring its src_bucket "
    "conflict domains — racing appends into other buckets serialize, "
    "overlapping ones conflict-and-recompute (racing interleave "
    "test-pinned in tests/test_tlog_artifacts.py). Every read (entry "
    "points, per-hop bucket scans) goes through the snapshot's "
    "log-level file pruning instead of directory listings. The oracle "
    "is the SAME unrolled beam replay as ann_nsw_beam_topk — a hash "
    "match proves split-commit + compact + snapshot reads reproduce "
    "the legacy layout's ranking bit-for-bit.",
)
def tlog_nsw_lifecycle_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = ensure_tlog_nsw_built(spark, sf_dir)
    q = _norm_query_vec(spark, sf_dir, _QID)
    return nsw_search_df(spark, path, q, k=10, ef=_EF, hops=_HOPS)


# ----------------------------------------------------------- hierarchy

_M_UPPER = 8
_LEVEL_MULT = 8
_MAX_LEVEL = 3
_UPPER_HOPS = 3
_HQID = 11


def ensure_hnsw_built(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent hierarchical build: layered graph + entry artifacts
    once per corpus content; returns the layout path."""
    from cnc_visionsearch_spark.operators.graph_ann import hnsw_build

    path = f"{_ARTIFACT_ROOT}/{_corpus_tag(sf_dir)}/hnsw_m{_M}"
    if not os.path.exists(os.path.join(path, "_BUILT")):
        emb = with_normalized(load_table(spark, sf_dir, "embeddings")).select(
            "vec_id", "nvec"
        )
        hnsw_build(
            emb,
            path,
            m=_M,
            m_upper=_M_UPPER,
            level_mult=_LEVEL_MULT,
            max_level=_MAX_LEVEL,
        )
        open(os.path.join(path, "_BUILT"), "w").close()
    return path


def _lv_case() -> str:
    u = "('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT"
    whens = "".join(
        f" WHEN {u} % {_LEVEL_MULT**l} = 0 THEN {l}"
        for l in range(_MAX_LEVEL, 0, -1)
    )
    return f"CASE{whens} ELSE 0 END"


_LV_CTE = f"""
lv AS (SELECT vec_id, nvec, {_lv_case()} AS level FROM normed)
"""


def _layer_graph_ctes() -> str:
    """g1..g{max_level}: top-m_upper graph over each layer's nodes."""
    parts = []
    for l in range(1, _MAX_LEVEL + 1):
        parts.append(
            f"""
nodes{l} AS (SELECT vec_id, nvec FROM lv WHERE level >= {l}),
pairs{l} AS (
  SELECT a.vec_id AS src, b.vec_id AS dst, b.nvec AS dvec,
    {_L2SQ.format(a="a.nvec", b="b.nvec")} AS gd
  FROM nodes{l} a, nodes{l} b WHERE a.vec_id <> b.vec_id
),
g{l} AS (
  SELECT src, dst, dvec FROM (
    SELECT src, dst, dvec,
      ROW_NUMBER() OVER (PARTITION BY src ORDER BY gd ASC, dst ASC) AS rn
    FROM pairs{l}
  ) r WHERE rn <= {_M_UPPER}
)"""
        )
    return ",".join(parts)


def _descent_ctes() -> str:
    """entry -> per-layer greedy width-1 hop chains u{l}_{h}."""
    parts = [
        f"""
entry AS (SELECT vec_id, nvec FROM lv ORDER BY level DESC, vec_id ASC LIMIT 1),
u{_MAX_LEVEL}_0 AS MATERIALIZED (
  SELECT vec_id AS id, {_L2SQ.format(a="nvec", b="qvec")} AS d FROM entry, q
)"""
    ]
    for l in range(_MAX_LEVEL, 0, -1):
        if l < _MAX_LEVEL:
            parts.append(
                f"u{l}_0 AS (SELECT id, d FROM u{l + 1}_{_UPPER_HOPS})"
            )
        for h in range(1, _UPPER_HOPS + 1):
            parts.append(
                f"""
u{l}_{h} AS MATERIALIZED (
  SELECT id, d FROM (
    SELECT id, d FROM u{l}_{h - 1}
    UNION
    SELECT g.dst AS id, {_L2SQ.format(a="g.dvec", b="qvec")} AS d
    FROM g{l} g, q WHERE g.src IN (SELECT id FROM u{l}_{h - 1})
  ) ORDER BY d ASC, id ASC LIMIT 1
)"""
            )
    return ",".join(parts)


def _l0_beam_ctes(hops: int, ef: int) -> str:
    """Layer-0 beam seeded by the descended node (vs the flat tier's
    fixed smallest-id entries)."""
    parts = [f"b0 AS (SELECT id, d FROM u1_{_UPPER_HOPS})"]
    for i in range(1, hops + 1):
        parts.append(
            f"""
c{i} AS MATERIALIZED (
  SELECT id, d FROM b{i - 1}
  UNION
  SELECT g.dst AS id, {_L2SQ.format(a="g.dvec", b="qvec")} AS d
  FROM graph g, q WHERE g.src IN (SELECT id FROM b{i - 1})
),
b{i} AS MATERIALIZED (SELECT id, d FROM c{i} ORDER BY d ASC, id ASC LIMIT {ef})"""
        )
    return ",".join(parts)


@register(
    "ann_hnsw_layer_census",
    oracle=f"""
WITH {_NORM_CTE}, {_LV_CTE}, {_GRAPH_CTE}, {_layer_graph_ctes()}
SELECT 0 AS layer, CAST(count(DISTINCT src) AS BIGINT) AS n_nodes,
  CAST(count(*) AS BIGINT) AS n_edges FROM graph
"""
    + "".join(
        f"""UNION ALL
SELECT {l}, CAST(count(DISTINCT src) AS BIGINT),
  CAST(count(*) AS BIGINT) FROM g{l}
"""
        for l in range(1, _MAX_LEVEL + 1)
    )
    + "ORDER BY layer",
    doc="HNSW hierarchy build audit: nodes and edges per layer of the "
    "persisted layered graph. Level assignment is a deterministic "
    f"hash pyramid (P(level >= l) = {_LEVEL_MULT}^-l, integer "
    "arithmetic over u32(md5(id)) — the SQL-replayable analog of "
    "HNSW's geometric level draw, reference main.py:60 IndexHNSWFlat); "
    "layer 0 is the flat NSW top-m graph, each upper layer the "
    f"top-{_M_UPPER} graph over its surviving nodes, all in ONE table "
    "partitioned by (layer, src_bucket). Hash-matching the oracle's "
    "per-layer ranked pair joins pins membership AND adjacency of "
    "every layer.",
)
def ann_hnsw_layer_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = ensure_hnsw_built(spark, sf_dir)
    g = spark.read.parquet(f"{path}/graph")
    out = None
    for l in range(0, _MAX_LEVEL + 1):
        cen = g.filter(F.col("layer") == l).agg(
            F.lit(l).alias("layer"),
            F.countDistinct("src").cast("bigint").alias("n_nodes"),
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        )
        out = cen if out is None else out.unionByName(cen)
    return out.orderBy("layer")


@register(
    "ann_hnsw_descend_topk",
    oracle=f"""
WITH {_NORM_CTE.replace("normed AS (", "normed AS MATERIALIZED (")},
q AS (SELECT nvec AS qvec FROM normed WHERE vec_id = {_HQID}),
{_LV_CTE.replace("lv AS (", "lv AS MATERIALIZED (")},
{_GRAPH_CTE.replace("graph AS (", "graph AS MATERIALIZED (")},
{_layer_graph_ctes().replace(" AS (", " AS MATERIALIZED (")},
{_descent_ctes()},
{_l0_beam_ctes(_HOPS, _EF)}
SELECT CAST(id AS BIGINT) AS vec_id, d AS distance
FROM b{_HOPS} ORDER BY distance ASC, vec_id ASC LIMIT 10
""",
    doc="Hierarchical NSW search — the full HNSW shape of the "
    "reference's index (main.py:60-62): enter at the max-level node, "
    f"{_UPPER_HOPS} greedy width-1 hops per upper layer (each ONE scan "
    "pruned to layer partition x the current node's bucket, <= "
    f"{_M_UPPER} edge rows; a layer with no closer neighbor is a "
    "no-op), then the standard ef-wide beam at layer 0 SEEDED BY the "
    "descended node instead of fixed smallest-id entries — the "
    "O(log n) entry-point localization that makes graph search "
    "corpus-size-independent before the wide beam starts. The oracle "
    "replays level assignment, every layer graph, every descent hop, "
    "and the layer-0 beam as unrolled CTEs: the whole hierarchy is "
    "hash-gated. Recall gates vs exact live in tests/test_ann_graph.py.",
)
def ann_hnsw_descend_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cnc_visionsearch_spark.operators.graph_ann import hnsw_search_df

    path = ensure_hnsw_built(spark, sf_dir)
    q = _norm_query_vec(spark, sf_dir, _HQID)
    return hnsw_search_df(
        spark, path, q, k=10, ef=_EF, hops=_HOPS, upper_hops=_UPPER_HOPS
    )


def _fragment_tlog_hnsw(spark: SparkSession, path: str) -> None:
    """Lifecycle scaffolding (r10 advice — moved OUT of the hnsw_build
    production API): rewrite every live (layer, bucket) edge file into
    TWO files (even/odd dst) as one rewrite commit, so the following
    compact has real multi-file domains to settle. The halves are read
    from the COMMITTED parquet files — one prior evaluation, one
    source of truth — so they are disjoint and exhaustive regardless
    of how the candidate generator behaves; content is unchanged (same
    rows, more files)."""
    from cnc_visionsearch_spark.operators.graph_ann import (
        _HGRAPH_SCHEMA,
        _hnsw_tag_expr,
    )
    from cnc_visionsearch_spark.sources.tlog import TLog

    t = TLog(path)
    snap = t.snapshot()
    old = [p for p, b in snap.files if b is not None]
    touched = sorted({b for _p, b in snap.files if b is not None})
    src = spark.read.schema(_HGRAPH_SCHEMA).parquet(
        *[os.path.join(t.root, p) for p in old]
    )
    adds = t.write_data(
        src.filter(F.col("dst") % 2 == 0), bucket_expr=_hnsw_tag_expr()
    ) + t.write_data(
        src.filter(F.col("dst") % 2 == 1), bucket_expr=_hnsw_tag_expr()
    )
    t.commit(
        adds=adds,
        removes=old,
        read_version=snap.version,
        op="rewrite",
        domains=touched,
    )


def ensure_tlog_hnsw_built(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent TRANSACTIONAL HNSW lifecycle: one init commit (the
    layered edge table + the entry in commit META), a FRAGMENT rewrite
    commit splitting every (layer, bucket) domain into two files (the
    accreted-history shape a compact exists for), then ONE hnsw_compact
    rewrite commit under the optimistic loop. Final graph CONTENT
    equals a one-shot build by construction."""
    import shutil

    from cnc_visionsearch_spark.operators.graph_ann import (
        hnsw_build,
        hnsw_compact,
    )
    from cnc_visionsearch_spark.sources.tlog import run_transaction

    path = f"{_ARTIFACT_ROOT}/{_corpus_tag(sf_dir)}/hnsw_tlog_m{_M}"
    marker = os.path.join(path, "_HISTORY")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        emb = with_normalized(load_table(spark, sf_dir, "embeddings")).select(
            "vec_id", "nvec"
        )
        hnsw_build(
            emb,
            path,
            m=_M,
            m_upper=_M_UPPER,
            level_mult=_LEVEL_MULT,
            max_level=_MAX_LEVEL,
            use_tlog=True,
        )
        _fragment_tlog_hnsw(spark, path)
        run_transaction(lambda: hnsw_compact(spark, path))
        open(marker, "w").close()
    return path


@register(
    "tlog_hnsw_lifecycle_topk",
    oracle=f"""
WITH {_NORM_CTE.replace("normed AS (", "normed AS MATERIALIZED (")},
q AS (SELECT nvec AS qvec FROM normed WHERE vec_id = {_HQID}),
{_LV_CTE.replace("lv AS (", "lv AS MATERIALIZED (")},
{_GRAPH_CTE.replace("graph AS (", "graph AS MATERIALIZED (")},
{_layer_graph_ctes().replace(" AS (", " AS MATERIALIZED (")},
{_descent_ctes()},
{_l0_beam_ctes(_HOPS, _EF)}
SELECT CAST(id AS BIGINT) AS vec_id, d AS distance
FROM b{_HOPS} ORDER BY distance ASC, vec_id ASC LIMIT 10
""",
    doc="HNSW descent over a TRANSACTIONAL layered layout after its "
    "full write lifecycle (r10; fragment scaffolding moved out of the "
    "build API in r11): the layered edge table lands as ONE init "
    "commit, a fragment rewrite commit splits every (layer, bucket) "
    "conflict domain into two files from the committed bytes (one "
    "evaluation, one source of truth), the ENTRY rides commit META "
    "instead of a swapped directory — entry promotion is a "
    "read-modify-write "
    "meta-key commit, so racing promotions serialize through the "
    "base_version rebase window (the arbitration the legacy swap "
    "lacked; promotion + racing interleaves test-pinned in tests/"
    "test_tlog_artifacts.py) — then hnsw_compact rewrites every "
    "multi-file domain as ONE commit. Reads (entry from snapshot "
    "meta, per-hop (layer, bucket) scans via log-level file pruning) "
    "replace directory listings at the same plan shape. The oracle is "
    "the SAME unrolled hierarchy replay as ann_hnsw_descend_topk — a "
    "hash match proves split-commit + meta entry + compact + snapshot "
    "reads reproduce the legacy ranking bit-for-bit.",
)
def tlog_hnsw_lifecycle_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cnc_visionsearch_spark.operators.graph_ann import hnsw_search_df

    path = ensure_tlog_hnsw_built(spark, sf_dir)
    q = _norm_query_vec(spark, sf_dir, _HQID)
    return hnsw_search_df(
        spark, path, q, k=10, ef=_EF, hops=_HOPS, upper_hops=_UPPER_HOPS
    )
