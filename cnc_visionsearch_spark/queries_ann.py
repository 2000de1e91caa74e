"""ANN-tier queries (SURVEY §4, §7.5) — deterministic approximate
search, so even the *approximate* tiers are oracle-checkable: the
pruning structures (seeded hyperplanes, stride centroids) are pure
functions of the data, and candidate scoring uses the same
sequential-fold double arithmetic on both engines. Recall-vs-exact
gates live in tests/test_ann.py (SURVEY §5.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cnc_visionsearch_spark.operators.ann import (
    hyperplane_signature,
    hyperplanes,
    ivf_assign,
    ivf_centroids,
    ivf_topk,
    lsh_topk,
    sharded_topk,
)
from cnc_visionsearch_spark.operators.knn import with_normalized
from cnc_visionsearch_spark.registry import register
from cnc_visionsearch_spark.sources.catalog import load_table

_DIM = 64  # fixture embedding dimension (FIXTURES.md)
_N_PLANES = 6
_SEED = 42

_NORM_CTE = """
normed AS (
  SELECT vec_id, label,
    list_transform(
      embedding::DOUBLE[],
      x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y)))
    ) AS nvec
  FROM embeddings
)
"""

_L2SQ = "list_sum(list_transform(range(1, len({a})+1), i -> ({a}[i]-{b}[i])**2))"


def _planes_cte() -> str:
    """The seeded hyperplanes as a SQL VALUES CTE (same doubles as the
    Spark literals — both parse the identical 6-decimal text)."""
    rows = []
    for i, plane in enumerate(hyperplanes(_DIM, _N_PLANES, _SEED)):
        arr = "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"
        rows.append(f"({i}, {arr})")
    return "planes(i, p) AS (VALUES " + ", ".join(rows) + ")"


_SIG_CTE = f"""
sigs AS (
  SELECT vec_id,
    CAST(SUM(CASE WHEN list_sum(list_transform(range(1, len(nvec)+1),
                    j -> nvec[j] * p[j])) >= 0
         THEN (1::BIGINT << i) ELSE 0::BIGINT END) AS BIGINT) AS lsh_bucket
  FROM normed, planes
  GROUP BY vec_id
)
"""


def _norm_query_vec(spark: SparkSession, sf_dir: str, vec_id: int) -> list[float]:
    emb = load_table(spark, sf_dir, "embeddings")
    raw = emb.filter(F.col("vec_id") == vec_id).select("embedding").first()[0]
    q = [float(x) for x in raw]
    n = sum(x * x for x in q) ** 0.5  # sequential fold, same as the SQL oracle
    return [x / n for x in q]


@register(
    "ann_lsh_bucket_histogram",
    oracle=f"""
WITH {_NORM_CTE}, {_planes_cte()}, {_SIG_CTE}
SELECT lsh_bucket, CAST(count(*) AS BIGINT) AS n_vectors,
  CAST(min(vec_id) AS BIGINT) AS sample_id
FROM sigs GROUP BY lsh_bucket
""",
    doc="LSH build step: sign-bit signatures over 6 seeded hyperplanes; "
    "bucket population histogram. Pure codegen scan — the structure an "
    "ingest pipeline co-computes and partitions by at 100 TB.",
)
def ann_lsh_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_normalized(load_table(spark, sf_dir, "embeddings"))
    planes = hyperplanes(_DIM, _N_PLANES, _SEED)
    return (
        emb.withColumn("lsh_bucket", hyperplane_signature("nvec", planes))
        .groupBy("lsh_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("sample_id"),
        )
    )


@register(
    "ann_lsh_topk",
    oracle=f"""
WITH {_NORM_CTE}, {_planes_cte()}, {_SIG_CTE},
q AS (
  SELECT n.nvec AS qvec, s.lsh_bucket AS qsig
  FROM normed n JOIN sigs s USING (vec_id) WHERE n.vec_id = 3
)
SELECT s.vec_id, {_L2SQ.format(a="n.nvec", b="q.qvec")} AS distance
FROM sigs s JOIN normed n USING (vec_id), q
WHERE s.lsh_bucket = q.qsig
ORDER BY distance ASC, s.vec_id ASC
LIMIT 10
""",
    doc="LSH probe: query scans only its own bucket (~1/2^6 of the "
    "corpus) then exact-ranks. Approximate by recall, deterministic by "
    "computation — hash-matchable. tests/test_ann.py gates recall.",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_normalized(load_table(spark, sf_dir, "embeddings"))
    q = _norm_query_vec(spark, sf_dir, 3)
    return lsh_topk(emb, q, k=10, n_planes=_N_PLANES, seed=_SEED)


_IVF_CTE = f"""
stride AS (SELECT greatest(max(vec_id) // 8, 1) AS s FROM embeddings),
centroids AS (
  SELECT CAST(vec_id // s AS INT) AS cell_id, nvec AS centroid
  FROM normed, stride
  WHERE vec_id % s = 0 AND vec_id // s < 8
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


@register(
    "ann_ivf_cells",
    oracle=f"""
WITH {_NORM_CTE}, {_IVF_CTE}
SELECT cell_id, CAST(count(*) AS BIGINT) AS n_vectors,
  CAST(min(vec_id) AS BIGINT) AS sample_id
FROM assigned GROUP BY cell_id
""",
    doc="IVF build: nearest-centroid cell assignment (broadcast codebook, "
    "one scan, no corpus shuffle); cell histogram. At scale the table is "
    "written PARTITIONED BY cell_id so probes become partition pruning.",
)
def ann_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_normalized(load_table(spark, sf_dir, "embeddings"))
    cents = ivf_centroids(emb, n_cells=8)
    return (
        ivf_assign(emb, cents)
        .groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("sample_id"),
        )
    )


@register(
    "ann_ivf_topk",
    oracle=f"""
WITH {_NORM_CTE}, {_IVF_CTE},
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
    doc="IVF probe: rank cells by centroid distance, scan nprobe=4 of 8 "
    "cells, exact top-k within. Reads nprobe/n_cells of the corpus.",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_normalized(load_table(spark, sf_dir, "embeddings"))
    cents = ivf_centroids(emb, n_cells=8)
    assigned = ivf_assign(emb, cents)
    q = _norm_query_vec(spark, sf_dir, 3)
    return ivf_topk(assigned, cents, q, k=10, nprobe=4)


@register(
    "knn_sharded_topk",
    oracle=f"""
WITH {_NORM_CTE},
q AS (SELECT nvec AS qvec FROM normed WHERE vec_id = 1)
SELECT vec_id, {_L2SQ.format(a="nvec", b="qvec")} AS distance
FROM normed, q
ORDER BY distance ASC, vec_id ASC
LIMIT 10
""",
    doc="Sharded-local-index kNN (BASELINE 'batch FAISS build' pattern): "
    "hash-shard -> applyInPandas local search per shard (FAISS HNSW "
    "M=32/efSearch=300 if installed, exact numpy here) -> k*S candidates "
    "-> exact JVM re-score + global top-k. Exact local search makes it "
    "bit-identical to knn_single_topk, hence the shared oracle.",
)
def knn_sharded_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_normalized(load_table(spark, sf_dir, "embeddings"))
    q = _norm_query_vec(spark, sf_dir, 1)
    return sharded_topk(emb, q, k=10, num_shards=8)
