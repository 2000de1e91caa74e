"""Incremental ANN index maintenance queries (VERDICT r3 §Next-round
#1): probes over layouts built from a BASE corpus slice and then
EXTENDED with :func:`ivf_append` / :func:`pq_append` /
:func:`shard_append` — the batch twin of the reference's online
``index.add_with_ids`` (main.py:134). These queries prove the living-
corpus story end to end: after an append, probes see the union with
unchanged semantics (same frozen codebook -> same probe order), and
the oracle checks it against a from-scratch computation over the full
corpus.

REGISTRATION ORDER: this module imports LAST in registry._load_all —
its queries sit past the driver's 50-entry correctness window
(tests/test_registry_window.py pins the window).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cnc_visionsearch_spark.operators.ann import (
    ivf_append,
    ivf_build,
    ivf_probe,
    pq_append,
    pq_build,
    shard_append,
    shard_build,
    sharded_topk_persisted,
)
from cnc_visionsearch_spark.operators.knn import with_normalized
from cnc_visionsearch_spark.queries_ann import (
    _ARTIFACT_ROOT,
    _L2SQ,
    _NORM_CTE,
    _PQ_M,
    _corpus_tag,
    _norm_query_vec,
    _pq_sql,
)
from cnc_visionsearch_spark.registry import register
from cnc_visionsearch_spark.sources.catalog import load_table

# The base/append split: layouts build over vec_id < _SPLIT, then the
# remaining vectors arrive as an append batch (fixtures carry 500
# vectors at every sf, FIXTURES.md — so base=300, append=200).
_SPLIT = 300

# IVF oracle CTEs with the codebook FROZEN at build time: centroids
# come from the base slice only (stride over the base's max id), but
# every vector — base and appended — is assigned against them. This is
# exactly what ivf_build(base) + ivf_append(rest) materializes.
_IVF_APPEND_CTE = f"""
stride AS (
  SELECT greatest(max(vec_id) // 8, 1) AS s FROM embeddings
  WHERE vec_id < {_SPLIT}
),
centroids AS (
  SELECT CAST(vec_id // s AS INT) AS cell_id, nvec AS centroid
  FROM normed, stride
  WHERE vec_id < {_SPLIT} AND vec_id % s = 0 AND vec_id // s < 8
),
assigned AS (
  SELECT vec_id, cell_id, nvec FROM (
    SELECT n.vec_id, c.cell_id, n.nvec,
      row_number() OVER (
        PARTITION BY n.vec_id
        ORDER BY {_L2SQ.format(a="n.nvec", b="c.centroid")} ASC, c.cell_id ASC
      ) AS rn
    FROM normed n, centroids c
  ) WHERE rn = 1
)
"""


def ensure_appended_layout(
    spark: SparkSession, sf_dir: str, n_cells: int = 8
) -> str:
    """Idempotent build-then-append lifecycle for the IVF(+PQ) layout:
    build over the base slice, encode its PQ codes, then append the
    remaining vectors into both tables against the frozen codebook.
    Keyed by corpus content (fingerprint in _corpus_tag), so a fixture
    regeneration rebuilds."""
    path = f"{_ARTIFACT_ROOT}/{_corpus_tag(sf_dir)}/ivf_append_c{n_cells}"
    marker = os.path.join(path, f"_APPENDED_m{_PQ_M}")
    if not os.path.exists(marker):
        emb = with_normalized(load_table(spark, sf_dir, "embeddings"))
        base = emb.filter(F.col("vec_id") < _SPLIT)
        rest = emb.filter(F.col("vec_id") >= _SPLIT)
        ivf_build(base, path, n_cells=n_cells)
        pq_build(spark, path, m=_PQ_M)
        ivf_append(spark, path, rest)
        pq_append(spark, path, rest, m=_PQ_M)
        open(marker, "w").close()
    return path


def ensure_appended_shards(
    spark: SparkSession, sf_dir: str, num_shards: int = 8
) -> str:
    """Idempotent shard_build(base) + shard_append(rest) lifecycle."""
    path = f"{_ARTIFACT_ROOT}/{_corpus_tag(sf_dir)}/shards_append_s{num_shards}"
    marker = os.path.join(path, "_APPENDED")
    if not os.path.exists(marker):
        emb = with_normalized(load_table(spark, sf_dir, "embeddings"))
        shard_build(emb.filter(F.col("vec_id") < _SPLIT), path, num_shards=num_shards)
        shard_append(spark, path, emb.filter(F.col("vec_id") >= _SPLIT))
        open(marker, "w").close()
    return path


@register(
    "ann_ivf_append_topk",
    oracle=f"""
WITH {_NORM_CTE}, {_IVF_APPEND_CTE},
q AS (SELECT nvec AS qvec FROM normed WHERE vec_id = 3),
probe AS (
  SELECT cell_id FROM centroids, q
  ORDER BY {_L2SQ.format(a="centroid", b="qvec")} ASC, cell_id ASC
  LIMIT 4
)
SELECT a.vec_id, {_L2SQ.format(a="a.nvec", b="q.qvec")} AS distance
FROM assigned a, q
WHERE a.cell_id IN (SELECT cell_id FROM probe)
ORDER BY distance ASC, a.vec_id ASC
LIMIT 10
""",
    doc="IVF probe over a layout built from the base slice then "
    "EXTENDED with ivf_append — the reference's add_with_ids "
    "(main.py:134) as a batch job. The appended vectors are assigned "
    "against the frozen build-time codebook and land as new files in "
    "their cell partitions (existing files byte-untouched, asserted in "
    "tests); the probe is plain partition pruning over the union. The "
    "oracle recomputes the same frozen-codebook semantics from "
    "scratch, so a hash match proves append == rebuild for probe "
    "purposes.",
)
def ann_ivf_append_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = ensure_appended_layout(spark, sf_dir, n_cells=8)
    q = _norm_query_vec(spark, sf_dir, 3)
    return ivf_probe(spark, path, q, k=10, nprobe=4)


@register(
    "ann_pq_append_code_histogram",
    oracle=f"""
WITH {_NORM_CTE}, {_IVF_APPEND_CTE}, {_pq_sql("normed")}
SELECT sub_j, code, CAST(count(*) AS BIGINT) AS n_vectors,
  CAST(min(vec_id) AS BIGINT) AS sample_id
FROM codes GROUP BY sub_j, code
""",
    doc="Codebook-utilization histogram over the APPENDED PQ code "
    "table: codes for the base slice were encoded by pq_build, the "
    "rest arrived via pq_append against the same frozen codebook. "
    "Codes are per-vector functions of the codebook, so the appended "
    "table must hash-equal a from-scratch encode of the full corpus — "
    "which is exactly what the oracle computes.",
)
def ann_pq_append_code_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = ensure_appended_layout(spark, sf_dir, n_cells=8)
    codes = spark.read.parquet(f"{path}/pq_codes")
    return codes.groupBy("sub_j", "code").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("vec_id").alias("sample_id"),
    )


@register(
    "ann_shard_append_topk",
    oracle=f"""
WITH {_NORM_CTE},
q AS (SELECT nvec AS qvec FROM normed WHERE vec_id = 9)
SELECT vec_id, {_L2SQ.format(a="nvec", b="qvec")} AS distance
FROM normed, q
ORDER BY distance ASC, vec_id ASC
LIMIT 10
""",
    doc="Sharded kNN probe over a shard_build(base) + shard_append "
    "(rest) layout: appended vectors land in their id-mod shard "
    "partitions (geometry pinned by the layout's sidecar), existing "
    "files byte-untouched; with exact local search the probe equals "
    "the exact tier over the UNION — the oracle is the plain exact "
    "top-10, so a hash match proves the appended shard layout serves "
    "complete results.",
)
def ann_shard_append_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = ensure_appended_shards(spark, sf_dir, num_shards=8)
    q = _norm_query_vec(spark, sf_dir, 9)
    return sharded_topk_persisted(spark, path, q, k=10)
