"""Skew- and range-aware operators ([EXT] scale patterns; the north
star calls out salting and interval joins explicitly — the reference
has no analog, SURVEY §2.3/§2.6).

Two patterns that keep hot keys from serializing a 1000-executor job:

* :func:`salted_distinct_count` — two-phase distinct aggregation. A
  plain ``countDistinct`` by a low-cardinality key (5 event types, one
  reducer each) funnels every row of a hot key through one task.
  Salting by ``hash(entity) % n_salts`` splits each key into n_salts
  cells whose partial distinct-counts ADD EXACTLY (the same entity
  always lands in the same cell), so phase 2 sums tiny rows.

* :func:`range_join_bucketed` — interval equi-bucketing. The naive
  ``l.key == r.key AND r.t BETWEEN l.t+lo AND l.t+hi`` is a
  BroadcastNestedLoop / cartesian per key. Bucketing time into
  ``hi - lo``-wide cells turns it into an EQUI-join on (key, bucket)
  with left fan-out <= 2 (an interval of length w overlaps at most two
  w-wide cells), then an exact residual filter. One hash shuffle, no
  quadratic blowup, AQE-splittable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_distinct_count", "range_join_bucketed"]


def salted_distinct_count(
    df: DataFrame,
    group_col: str,
    entity_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact distinct count per group, skew-safe.

    Phase 1 groups by (group, salt) where salt = pmod(hash(entity), n)
    — same entity, same salt, so per-cell distincts are disjoint.
    Phase 2 sums the n_salts partials per group. Both shuffles carry
    counts, never raw rows of the hot key into one task.
    """
    salt = F.pmod(F.hash(F.col(entity_col)), F.lit(n_salts)).alias("__salt")
    phase1 = (
        df.select(F.col(group_col), F.col(entity_col), salt)
        .groupBy(group_col, "__salt")
        .agg(F.countDistinct(entity_col).alias("__partial"))
    )
    return phase1.groupBy(group_col).agg(
        F.sum("__partial").cast("bigint").alias(out_col)
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    lo_seconds: int,
    hi_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Pairs (l, r) with l.key == r.key and
    r.time in [l.time + lo, l.time + hi], via time-bucket equi-join.

    Bucket width = hi - lo, so each left interval overlaps <= 2 buckets
    (left side exploded to those); right rows map to exactly one. The
    join is a plain equi-join on (key, bucket) — hash shuffle, codegen,
    AQE skew-split — followed by the exact residual range filter.
    """
    if hi_seconds <= lo_seconds:
        raise ValueError("need hi_seconds > lo_seconds")
    if how != "inner":
        # the residual range predicate runs as a post-join filter, which
        # would silently drop the null-extended rows of an outer join —
        # refuse rather than degenerate to inner semantics
        raise ValueError(
            "range_join_bucketed supports how='inner' only (outer variants "
            "would need the residual predicate folded into the join "
            f"condition); got how={how!r}"
        )
    w = hi_seconds - lo_seconds

    def bucket_of(ts: Column) -> Column:
        return F.floor(ts.cast("long") / w).cast("long")

    lt = F.col(left_time).cast("long")
    l_buckets = F.array_distinct(
        F.array(bucket_of(lt + lo_seconds), bucket_of(lt + hi_seconds))
    )
    l_exploded = left.withColumn("__bucket", F.explode(l_buckets))
    r_bucketed = right.withColumn("__bucket", bucket_of(F.col(right_time).cast("long")))

    rt = F.col(right_time).cast("long")
    joined = l_exploded.join(r_bucketed, [key, "__bucket"], how).filter(
        (rt >= lt + lo_seconds) & (rt <= lt + hi_seconds)
    )
    return joined.drop("__bucket")
