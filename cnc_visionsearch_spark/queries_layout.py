"""Z-order layout queries (operators/layout.py) — the multi-dimension
pruning tier of the [EXT] 100 TB surface.

Both queries bucket events into a 256x256 grid (ub = user_id & 255,
vb = least(floor(value/2), 255) — fixed-width, engine-exact integer
arithmetic) and derive the 16-bit Morton key from the SAME generated
SQL text on both engines (morton_sql 'spark' vs 'duckdb' dialects), so
the layout key itself is hash-verified bit-for-bit against DuckDB.

`z_block` = top byte of the key = one 16x16 tile of the grid: the
contiguous unit a z-range file covers, and therefore the unit a
multi-dimensional predicate prunes on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cnc_visionsearch_spark.operators.layout import morton_sql
from cnc_visionsearch_spark.registry import register
from cnc_visionsearch_spark.sources.catalog import load_table

_BITS = 8

# ub/vb bucketing, once, per dialect-neutral SQL text (valid in both).
_UB = "(user_id & 255)"
_VB = "LEAST(CAST(FLOOR(value / 2) AS INTEGER), 255)"

_Z_SPARK = morton_sql(["ub", "vb"], _BITS, "spark")
_Z_DUCK = morton_sql(["ub", "vb"], _BITS, "duckdb")

# 2-D predicate used by the pruning-gain query: a 16x32 rectangle
# (0.8% of the 256x256 key space).
_PRED = "(ub BETWEEN 32 AND 47 AND vb BETWEEN 64 AND 95)"


def _bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.expr(_UB).alias("ub"), F.expr(_VB).alias("vb")
    ).withColumn("z", F.expr(_Z_SPARK))


@register(
    "events_zorder_block_stats",
    oracle=f"""
WITH b AS (SELECT {_UB} AS ub, {_VB} AS vb FROM events),
z AS (SELECT ub, vb, {_Z_DUCK} AS z FROM b)
SELECT z >> 8 AS z_block,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(min(ub) AS BIGINT) AS ub_min, CAST(max(ub) AS BIGINT) AS ub_max,
  CAST(min(vb) AS BIGINT) AS vb_min, CAST(max(vb) AS BIGINT) AS vb_max
FROM z GROUP BY 1
""",
    doc="Morton-key tile profile: per z_block (16x16 tile) row count and "
    "per-dimension min/max — every block's spans are <= 15, the locality "
    "a z-range file inherits. Key arithmetic is the same generated SQL "
    "text on both engines (operators/layout.py morton_sql).",
)
def events_zorder_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    z = _bucketed(spark, sf_dir)
    return (
        z.groupBy(F.expr("shiftright(z, 8)").alias("z_block"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ub").cast("bigint").alias("ub_min"),
            F.max("ub").cast("bigint").alias("ub_max"),
            F.min("vb").cast("bigint").alias("vb_min"),
            F.max("vb").cast("bigint").alias("vb_max"),
        )
    )


@register(
    "events_zorder_pruning_gain",
    oracle=f"""
WITH b AS (SELECT {_UB} AS ub, {_VB} AS vb FROM events),
z AS (SELECT ub, vb, ({_Z_DUCK}) >> 8 AS z_block,
             CASE WHEN {_PRED} THEN 1 ELSE 0 END AS hit
      FROM b),
w AS (SELECT z_block, hit,
             MAX(hit) OVER (PARTITION BY z_block) AS blk_hit
      FROM z)
SELECT CAST(count(DISTINCT z_block) AS BIGINT) AS total_blocks,
  CAST(count(DISTINCT CASE WHEN hit = 1 THEN z_block END) AS BIGINT) AS touched_blocks,
  CAST(sum(hit) AS BIGINT) AS rows_matched,
  CAST(sum(blk_hit) AS BIGINT) AS rows_in_touched_blocks
FROM w
""",
    doc="Read-amplification report for a 2-D range predicate under the "
    "z-order layout: of all populated z-blocks, how many a scan must "
    "touch, and how many rows those blocks hold vs rows actually "
    "matching. The ratio touched/total is the file-prune rate a footer "
    "min/max planner achieves on the z-sorted table.",
)
def events_zorder_pruning_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    z = _bucketed(spark, sf_dir).select(
        F.expr("shiftright(z, 8)").alias("z_block"),
        F.expr(f"CASE WHEN {_PRED} THEN 1 ELSE 0 END").alias("hit"),
    )
    w = z.withColumn(
        "blk_hit", F.max("hit").over(Window.partitionBy("z_block"))
    )
    return w.agg(
        F.countDistinct("z_block").alias("total_blocks"),
        F.countDistinct(F.when(F.col("hit") == 1, F.col("z_block"))).alias(
            "touched_blocks"
        ),
        F.sum("hit").cast("bigint").alias("rows_matched"),
        F.sum("blk_hit").cast("bigint").alias("rows_in_touched_blocks"),
    )
