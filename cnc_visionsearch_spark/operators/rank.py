"""Scale-safe global ranking / cumulative primitives.

The reference's core operator is a global top-k that never materializes
a global ordering of the corpus (main.py:155 — ``index.search`` returns
k hits, not a rank for every vector). These helpers are the SQL-shaped
twin of that discipline: they replace ``row_number() / ntile() /
sum() OVER (ORDER BY ...)`` — which Spark plans as a SINGLE-PARTITION
WindowExec ("No Partition Defined ... Moving all data to a single
partition") — with plans where every data-proportional stage is
partition-parallel:

- ``global_topn``: ``orderBy().limit(n)`` → TakeOrderedAndProject
  (per-partition heaps + k-way driver merge). The optional rank window
  runs over the <= n survivors — a CONSTANT-size single partition, so
  the plan is corpus-size-invariant. scripts/plan_audit.py's
  ``window_no_partition`` gate exempts windows above a limit for
  exactly this reason.
- ``distributed_cumsum``: EXACT global running totals (and optionally
  the exact global row number) with no global sort: range-repartition
  on the order key, per-band partitioned windows for the local
  prefixes, band totals folded into exclusive offsets via a
  bands x bands broadcast join (<= 32x32 rows — the only non-equi join
  in the plan is bounded by the band constant, never the data), then
  one broadcast join back. Every data-proportional stage is parallel;
  the result is bit-identical to the single-partition window because
  the order is total and addition is associative.
- ``exact_ntile``: exact NTILE(n) semantics (first ``T mod n`` buckets
  get one extra row) from the distributed row number plus the
  closed-form bucket formula — integer-only, hash-stable, and the
  production replacement for the "NTILE over an unpartitioned window"
  banding this repo previously documented as a fixture-scale trade
  (SCALE.md banded-NTILE row).

Determinism: callers MUST pass a total order (include a unique
tie-break column). Band assignment is a deterministic function of the
order key (RangePartitioner's boundary sampling is seeded per
partition index), and the final values are independent of where band
boundaries fall, so results hash-gate against single-partition-window
oracles.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_topn", "distributed_cumsum", "exact_ntile"]

_BAND = "_rk_band"
_LRN = "_rk_lrn"
_BN = "_rk_bn"
_OFFN = "_rk_offn"

DEFAULT_BANDS = 32


def _cols(order_cols: Sequence) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def global_topn(
    df: DataFrame,
    order_cols: Sequence,
    n: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Global top-n by ``order_cols`` (must be a total order) as a
    TakeOrderedAndProject — per-partition heaps, never a global sort.
    With ``rank_col``, adds the 1-based global rank via a window over
    the <= n survivors (bounded by construction; plan-audit-exempt)."""
    oc = _cols(order_cols)
    top = df.orderBy(*oc).limit(n)
    if rank_col is not None:
        top = top.withColumn(rank_col, F.row_number().over(Window.orderBy(*oc)))
    return top


def distributed_cumsum(
    df: DataFrame,
    order_cols: Sequence,
    sums: Iterable[tuple[Column, str]] = (),
    rn_col: str | None = None,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """df + exact global running totals over a total order, no global
    sort. ``sums`` is (source_expr, out_col) pairs; ``rn_col`` adds
    the exact global row number (BIGINT, 1-based)."""
    sums = list(sums)
    oc = _cols(order_cols)
    # The banded table feeds TWO consumers (within-band prefixes and
    # band totals). Without a barrier each branch re-executes the
    # range exchange, and RangePartitioner's boundary SAMPLING is not
    # guaranteed identical across the two executions (input row order
    # inside aggregate output partitions can differ) — at sf0.1 this
    # was observed to put boundary rows in band b for one branch and
    # b+1 for the other, silently corrupting the offsets. The
    # localCheckpoint pins ONE materialization (one partitioner, one
    # band assignment) that both branches read — the same barrier
    # discipline the CDC merge and the iterative graph loops use.
    t = (
        df.repartitionByRange(bands, *oc)
        .withColumn(_BAND, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    wp = Window.partitionBy(_BAND).orderBy(*oc)
    wf = wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = t.select(
        "*",
        F.row_number().over(wp).alias(_LRN),
        *[F.sum(e).over(wf).alias(f"_rk_l{i}") for i, (e, _) in enumerate(sums)],
    )
    # Band totals share the range exchange with `local` (ReusedExchange
    # under AQE); the non-equi prefix join is bands x bands — bounded
    # by the band CONSTANT, never by data size.
    btot = t.groupBy(_BAND).agg(
        F.count(F.lit(1)).alias(_BN),
        *[F.sum(e).alias(f"_rk_t{i}") for i, (e, _) in enumerate(sums)],
    )
    a = btot.alias("rk_a")
    b = btot.alias("rk_b")
    off = (
        a.join(
            F.broadcast(b),
            F.col(f"rk_b.{_BAND}") < F.col(f"rk_a.{_BAND}"),
            "left",
        )
        .groupBy(F.col(f"rk_a.{_BAND}").alias(_BAND))
        .agg(
            F.sum(F.col(f"rk_b.{_BN}")).alias(_OFFN),
            *[
                F.sum(F.col(f"rk_b._rk_t{i}")).alias(f"_rk_o{i}")
                for i in range(len(sums))
            ],
        )
    )
    out = local.join(F.broadcast(off), _BAND)
    if rn_col is not None:
        out = out.withColumn(
            rn_col,
            (F.col(_LRN) + F.coalesce(F.col(_OFFN), F.lit(0))).cast("bigint"),
        )
    for i, (_, name) in enumerate(sums):
        zero = F.lit(0)
        out = out.withColumn(
            name, F.col(f"_rk_l{i}") + F.coalesce(F.col(f"_rk_o{i}"), zero)
        )
    drop = [_BAND, _LRN, _OFFN]
    drop += [f"_rk_l{i}" for i in range(len(sums))]
    drop += [f"_rk_o{i}" for i in range(len(sums))]
    return out.drop(*drop)


def exact_ntile(
    df: DataFrame,
    order_cols: Sequence,
    n: int,
    out_col: str,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Exact NTILE(n) over a total order, distributed: SQL NTILE
    assigns ``T div n`` rows per bucket with the first ``T mod n``
    buckets taking one extra — a pure function of (row_number, T), so
    the distributed row number + one broadcast total reproduce it
    bit-for-bit without a single-partition sort."""
    rn = "_rk_rn"
    ranked = distributed_cumsum(df, order_cols, rn_col=rn, bands=bands)
    # T from the band totals would be ideal; an aggregate over df is
    # equivalent and keeps this composable (one extra partial+final
    # count, no second scan of anything wider than the input).
    tot = df.agg(F.count(F.lit(1)).cast("bigint").alias("_rk_tot"))
    out = ranked.crossJoin(F.broadcast(tot))
    base = F.expr(f"_rk_tot div {n}")
    rem = F.expr(f"_rk_tot % {n}")
    cut = (base + F.lit(1)) * rem
    r = F.col(rn)
    # rows 1..(base+1)*rem fill the first `rem` (base+1)-sized buckets;
    # the rest fill base-sized buckets. When T < n, base = 0 and every
    # row takes the first branch (cut = T), so the div-by-zero branch
    # is never evaluated for a kept row (Spark `div` yields NULL, and
    # the `when` guard masks it).
    bucket = F.when(
        r <= cut,
        F.expr(f"({rn} - 1) div (_rk_tot div {n} + 1)") + F.lit(1),
    ).otherwise(
        rem
        + F.expr(
            f"({rn} - 1 - (_rk_tot div {n} + 1) * (_rk_tot % {n})) "
            f"div (_rk_tot div {n})"
        )
        + F.lit(1)
    )
    return out.withColumn(out_col, bucket.cast("int")).drop(rn, "_rk_tot")
