"""As-of (point-in-time) join — the canonical operator Spark's built-in
join types don't cover (SURVEY §2.3: "sort-merge/range/as-of/interval
joins: absent" in the reference; standard equi/semi/anti come free from
``df.join``, as-of does not).

Semantics: for every left row, attach the single right row with the
same key and the greatest right_time <= left_time (ties broken by a
caller-supplied ordering column so results are deterministic).

Scale design — why NOT a range join: the naive
``left.join(right, key == key & rt <= lt)`` + ``max_by`` materializes
every (left, right) pair within the predicate — O(|L|·|R|) per key,
fatal for a 100 TB event log. The union+window form used here is the
streaming-merge formulation:

1. tag both sides and UNION them (cheap, no join),
2. one shuffle: hash-partition by key, sort each partition by
   (time, side, tiebreak) — right rows sorting BEFORE a left row with
   equal time so `<=` semantics hold,
3. running ``last(right_payload, ignoreNulls)`` over the ordered
   window gives each left row the latest right row at-or-before it,
4. keep left rows.

Cost: ONE shuffle of |L|+|R| rows and a per-partition sort — the same
price as a sort-merge equi-join, independent of temporal fan-in. Skewed
keys (one user with millions of events) are handled by AQE skew-split
of the sort; the window itself is a running aggregate, not a buffer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    right_payload: Sequence[str],
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Point-in-time join (left rows enriched, never multiplied).

    Every left column is preserved; each ``right_payload`` column
    arrives as ``<name><suffix>`` (NULL when no right row exists at or
    before the left row's time). ``tiebreak`` orders right rows sharing
    (key, time); the LAST one wins, matching
    ``row_number() OVER (ORDER BY time DESC, tiebreak DESC) = 1``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = F.struct(*[F.col(c) for c in right_payload])

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("bigint").alias("__tie"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType.simpleString()
        ).alias("__payload"),
    )
    r_tagged = right.select(
        *[
            F.col(c)
            if c in keys
            else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
        ],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("bigint").alias("__tie"),
        payload.alias("__payload"),
    )
    u = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = (
        u.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_payload
    ]
    return enriched.select(*out_cols)
