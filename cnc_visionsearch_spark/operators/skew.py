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

__all__ = ["salted_distinct_count", "range_join_bucketed", "salted_join"]


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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join de-hot-spotted by salting: each fact row gets a
    random-but-deterministic salt in [0, n_salts), the dim side is
    replicated n_salts times, and the join runs on (key, salt) — a hot
    key's rows spread over n_salts reducers instead of one.

    Use when BOTH sides are too big to broadcast and AQE's skew-split
    (which splits oversized sort-merge partitions) cannot help — e.g.
    the hot key's rows must meet MULTIPLE matching dim rows, so
    splitting the fact partition still re-reads the same dim partition.
    The dim replication multiplies its shuffle volume by n_salts: keep
    the dim side the smaller one and n_salts just big enough to flatten
    the hot keys (at 1000 executors, 16-64).

    The salt is pmod(xxhash64(all fact columns), n): deterministic (no
    rand(), so retried tasks re-salt identically), and rows of the same
    key spread by their differing payload columns — which is the whole
    point. Fully-identical duplicate rows share a salt; that is
    harmless skew of order duplicate-multiplicity, not key-cardinality.

    Supports inner and left joins (semantics preserved: every fact row
    keeps exactly its dim matches; dim rows without facts disappear as
    in any inner/left join from the fact side).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    salted_fact = fact.withColumn("__salt", salt)
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key])
        & (salted_fact["__salt"] == salted_dim["__salt"]),
        how,
    )
    return out.drop("__salt")
