"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.8 [EXT]; the north-star "custom stateful operators" slot).

The reference's only state is its in-RAM index + MAX+1 counter
(main.py:129-134). This module shows the general pattern Spark offers
for arbitrary keyed state: per-user running aggregates maintained
across micro-batches with explicit GroupState — the shape you'd use
for online dedup caches, per-key rate limiting, or incremental index
maintenance.

Scale notes: state is partitioned by the group key (user_id) exactly
like the shuffle for a batch groupBy — bounded per-key state (one
small tuple), checkpointed per batch via the streaming checkpoint, no
global structure. Arrow batches stream through the Python worker;
nothing accumulates beyond one group's rows per call.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["running_user_stats", "streaming_funnel_stage", "running_user_totals_tws", "kmv_sketch_stream", "kmv_hash", "ewma_trend_stream", "holt_trend_stream", "burst_segmentation_stream", "hll_sketch_stream"]

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("n_errors", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_errors", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _update(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n_events, n_errors, sum_value = state.get
    else:
        n_events, n_errors, sum_value = 0, 0, 0.0
    for pdf in pdfs:
        n_events += len(pdf)
        n_errors += int((pdf["event_type"] == "error").sum())
        sum_value += float(pdf["value"].sum())
    state.update((n_events, n_errors, sum_value))
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "n_events": n_events,
                "n_errors": n_errors,
                "sum_value": sum_value,
            }
        ]
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, n_errors, sum_value) across the whole
    stream — one updated row per user per micro-batch that saw them.

    Batch-equivalence contract (tested): after the stream drains, the
    LAST emitted row per user equals the batch groupBy over all input.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("stage", LongType()),
        StructField("stage_ts", LongType()),  # micros since epoch
    ]
)

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", LongType()),
    ]
)

_H12 = 12 * 3600 * 1_000_000  # micros
_H48 = 48 * 3600 * 1_000_000


def _funnel_update(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    stage, stage_ts = state.get if state.exists else (0, 0)
    # One key's rows can arrive as MULTIPLE Arrow chunks (split at
    # arrow.maxRecordsPerBatch) in arbitrary intra-key order — sorting
    # each chunk independently would walk events out of time order for
    # >chunk-size users. Concatenate first, sort once.
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch):
        batch = batch.sort_values("ts")
        for ts, etype in zip(batch["ts"], batch["event_type"]):
            t = int(ts.value // 1000)  # ns -> micros
            if stage == 0 and etype == "view":
                stage, stage_ts = 1, t
            elif stage == 1 and etype == "click" and stage_ts < t <= stage_ts + _H12:
                stage, stage_ts = 2, t
            elif stage == 2 and etype == "purchase" and stage_ts < t <= stage_ts + _H48:
                stage, stage_ts = 3, t
    state.update((stage, stage_ts))
    yield pd.DataFrame([{"user_id": user_id, "stage": stage}])


def streaming_funnel_stage(events: DataFrame) -> DataFrame:
    """Streaming twin of `events_funnel_conversion`'s sorted walk: the
    same (stage, stage_ts) state tuple, maintained per user across
    micro-batches with applyInPandasWithState (update mode — one row
    per user per batch that saw them).

    Equivalence contract (tested): when drops arrive in event-time
    order (each micro-batch sorted internally, batches non-overlapping
    in time — the Kafka-partition-per-user deployment), the final
    per-user stage equals the batch walk. With cross-batch time overlap
    the walk anchors on the first *processed* qualifying event instead
    of the min-ts one — the standard arrival-order caveat any
    incremental funnel has; a watermark + per-user reorder buffer
    removes it at the cost of emit latency.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel_update,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class _RunningTotalsProcessor(StatefulProcessor):
    """transformWithStateInPandas processor — the Spark 4 successor to
    applyInPandasWithState (typed named-state handles, per-state TTL,
    timers). Functionally the twin of :func:`running_user_stats`, kept
    side by side so both stateful APIs stay exercised: migrating an
    operator is exactly this diff."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState(
            "totals", "n_events bigint, sum_value double"
        )

    def handleInputRows(self, key, rows, timerValues):
        n_events, sum_value = (
            tuple(self._totals.get()) if self._totals.exists() else (0, 0.0)
        )
        for pdf in rows:
            n_events += int(len(pdf))
            sum_value += float(pdf["value"].sum())
        self._totals.update((n_events, sum_value))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n_events, "sum_value": sum_value}]
        )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` — the
    new arbitrary-state API. Same contract as running_user_stats: the
    LAST emitted row per user after the replay drains equals the batch
    aggregate (double sums compared with tolerance: accumulation order
    across micro-batches differs from the batch plan's)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        _RunningTotalsProcessor(),
        outputStructType="user_id bigint, n_events bigint, sum_value double",
        outputMode="Update",
        timeMode="None",
    )


# --------------------------------------------------- KMV distinct sketch

KMV_K = 64
KMV_HASH_MOD = 1073741824  # 2^30, matching events_kmv_distinct

KMV_STATE_SCHEMA = StructType(
    [StructField("minima", ArrayType(LongType()))]
)

KMV_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("n_minima", LongType()),
        StructField("kth_hash", LongType()),
        StructField("minima", ArrayType(LongType())),
    ]
)


def kmv_hash(col):
    """The shared KMV hash (one definition: functions/text.py) at this
    module's modulus — streaming sketch and batch query stay
    byte-equivalent by construction."""
    from cnc_visionsearch_spark.functions.text import kmv_hash as _kh

    return _kh(col, KMV_HASH_MOD)


def _kmv_update(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (shard,) = key
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        seen.update(int(h) for h in pdf["hv"])
    minima = sorted(seen)[:KMV_K]
    state.update((minima,))
    yield pd.DataFrame(
        [
            {
                "shard": shard,
                "n_minima": len(minima),
                "kth_hash": minima[-1] if minima else None,
                "minima": minima,
            }
        ]
    )


def kmv_sketch_stream(events: DataFrame, n_shards: int = 8) -> DataFrame:
    """Streaming KMV cardinality sketch — the incremental twin of the
    batch `events_kmv_distinct` query: per hash-shard, maintain the k
    smallest DISTINCT user hashes across micro-batches (bounded state:
    k BIGINTs per shard, ever) and emit the shard's sketch each batch.

    Mergeability is the point: the global k-minima are exactly the k
    smallest of the union of per-shard minima (each shard holds its
    own k smallest, and the global minima within a shard are a prefix
    of that), so a reader re-mins S·k rows to get the same estimate
    the batch sketch computes — tested to be IDENTICAL to the batch
    k-minima over the same input. This is the general shape of every
    distributed sketch (HLL registers, t-digest centroids): tiny
    keyed state + an associative merge, here with state the engine
    can hash-compare exactly.

    At scale: the pre-shuffle projection is (shard, hv) — 16 bytes/
    event; state is n_shards × k BIGINTs regardless of stream volume.
    """
    from pyspark.sql import functions as F

    hashed = events.select(
        kmv_hash(F.col("user_id")).alias("hv")
    ).withColumn("shard", F.col("hv") % n_shards)
    return hashed.groupBy("shard").applyInPandasWithState(
        _kmv_update,
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------- HLL register state

HLL_M = 64  # registers, matching queries_sketches_ext

HLL_STATE_SCHEMA = StructType([StructField("regs", ArrayType(LongType()))])

HLL_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_present", LongType()),
        StructField("harmonic_q", LongType()),
        StructField("regs", ArrayType(LongType())),
    ]
)


def _hll_update(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (etype,) = key
    regs = list(state.get[0]) if state.exists else [0] * HLL_M
    for pdf in pdfs:
        for b, r in zip(pdf["bucket"], pdf["rho"]):
            b, r = int(b), int(r)
            if r > regs[b]:
                regs[b] = r
    state.update((regs,))
    harmonic = sum(1 << (27 - r) if r > 0 else 1 << 27 for r in regs)
    yield pd.DataFrame(
        [
            {
                "event_type": etype,
                "n_present": sum(1 for r in regs if r > 0),
                "harmonic_q": harmonic,
                "regs": regs,
            }
        ]
    )


def hll_sketch_stream(events: DataFrame) -> DataFrame:
    """Streaming HyperLogLog — the incremental twin of the batch
    events_hll_cardinality query: per event type, maintain the 64
    leading-zero-rank registers (HLL_M = 64, alpha_64) across micro-batches (state = 64
    BIGINTs per key, EVER — the textbook bounded-state sketch) and
    emit the register vector + the exact-integer harmonic denominator
    each batch.

    The register-update projection (md5 hash → bucket, rho) is the
    SAME JVM expression the batch query uses
    (queries_sketches_ext.hll_bucket_rho — one definition), so the
    final streaming registers are byte-identical to the batch
    registers over the same input; register max is associative and
    idempotent, which is why replays and checkpoint recoveries cannot
    corrupt the sketch (tested to merge exactly to the batch state).

    At scale: pre-shuffle projection is (type, bucket, rho) — ~20
    bytes/event with map-side combining available to the planner;
    state size is independent of stream volume.
    """
    from cnc_visionsearch_spark.queries_sketches_ext import hll_bucket_rho

    hashed = hll_bucket_rho(
        events.select("event_type", "user_id")
    ).select("event_type", "bucket", "rho")
    return hashed.groupBy("event_type").applyInPandasWithState(
        _hll_update,
        outputStructType=HLL_OUTPUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------- EWMA trend state

EWMA_ALPHAS = ((0.7, 0.3), (0.95, 0.05))  # (1-a, a): fast, slow

EWMA_STATE_SCHEMA = StructType(
    [
        StructField("fast", DoubleType()),
        StructField("slow", DoubleType()),
        StructField("n_points", LongType()),
    ]
)

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_points", LongType()),
        StructField("ewma_fast", DoubleType()),
        StructField("ewma_slow", DoubleType()),
    ]
)


def _ewma_update(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (etype,) = key
    if state.exists:
        fast, slow, n = state.get
    else:
        fast = slow = None
        n = 0
    rows = pd.concat(list(pdfs)).sort_values("h")
    for x in rows["c"]:
        x = float(x)
        if fast is None:
            fast = x
            slow = x
        else:
            # the IDENTICAL chain the batch fold runs: (acc*om)+(x*al)
            fast = (fast * 0.7) + (x * 0.3)
            slow = (slow * 0.95) + (x * 0.05)
        n += 1
    state.update((fast, slow, n))
    yield pd.DataFrame(
        [
            {
                "event_type": etype,
                "n_points": n,
                "ewma_fast": fast,
                "ewma_slow": slow,
            }
        ]
    )


def ewma_trend_stream(hourly: DataFrame) -> DataFrame:
    """Streaming twin of the batch `events_ewma_trend` fold: per
    event_type, carry the fast/slow EWMA levels as TWO DOUBLES of
    keyed state across micro-batches (the recurrence is sequential —
    exactly what keyed streaming state is for). Input is the hourly
    count stream (event_type, h, c) an upstream windowed aggregate
    emits; rows are applied in hour order within each batch, so as
    long as triggers respect hour order the final state is
    BIT-IDENTICAL to the batch fold over the same series
    (test-pinned). State per key never grows — the 100 TB monitoring
    shape: O(|event types|) doubles, any stream length."""
    return hourly.groupBy("event_type").applyInPandasWithState(
        _ewma_update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------------------
# streaming sequence-pattern matcher (MATCH_RECOGNIZE twin)

_SEQ_STATE = StructType(
    [
        StructField("in_run", LongType()),
        StructField("cur_len", LongType()),
        StructField("n_matches", LongType()),
        StructField("longest", LongType()),
    ]
)

_SEQ_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_matches", LongType()),
        StructField("longest", LongType()),
    ]
)


def _seq_update(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        in_run, cur_len, n_matches, longest = state.get
    else:
        in_run, cur_len, n_matches, longest = 0, 0, 0, 0
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for sym in pdf["event_type"].str[:1]:
            if sym == "v":
                if in_run:
                    cur_len += 1
                else:
                    in_run, cur_len = 1, 1
            elif sym == "c":
                if in_run:
                    cur_len += 1
            elif sym == "p":
                if in_run:
                    cur_len += 1
                    n_matches += 1
                    longest = max(longest, cur_len)
                    in_run, cur_len = 0, 0
            else:  # error / signup break the run
                in_run, cur_len = 0, 0
    state.update((in_run, cur_len, n_matches, longest))
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "n_matches": n_matches,
                "longest": longest,
            }
        ]
    )


def sequence_match_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of events_sequence_pattern_match: the regex
    ``v[vc]*p`` compiled into its two-state DFA and run as keyed
    GroupState — (in_run, current_run_length, matches, longest) per
    user, four longs, updated across micro-batches. The batch query
    builds each user's full symbol string and counts non-overlapping
    regex matches; this operator never materializes the string (the
    DFA IS the unfinished suffix), so state stays O(1) per key no
    matter how long the history grows — the reason MATCH_RECOGNIZE
    engines compile patterns to automata. Contract: per-key
    event-time order within and across micro-batches (same as the
    EWMA twin; rows sort by (ts, event_id) inside each batch)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _seq_update,
        outputStructType=_SEQ_OUT,
        stateStructType=_SEQ_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------ Holt trend state

HOLT_STATE_SCHEMA = StructType(
    [
        StructField("l", LongType()),
        StructField("t", LongType()),
        StructField("n_days", LongType()),
    ]
)

HOLT_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_days", LongType()),
        StructField("level_q", LongType()),
        StructField("trend_q", LongType()),
        StructField("forecast7_q", LongType()),
    ]
)


def _holt_update(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (etype,) = key
    if state.exists:
        lvl, trd, n = state.get
    else:
        lvl = trd = None
        n = 0
    rows = pd.concat(list(pdfs)).sort_values("day")
    for y in rows["y_q"]:
        y = int(y)
        if lvl is None:
            lvl, trd = y, 0
        else:
            # the IDENTICAL integer recurrence of the batch fold
            # (events_holt_linear_forecast): Python >> is arithmetic
            # (floor) on negatives, same as Spark shiftright / DuckDB >>
            l2 = (y + lvl + trd) >> 1
            trd = (l2 - lvl + trd) >> 1
            lvl = l2
        n += 1
    state.update((lvl, trd, n))
    yield pd.DataFrame(
        [
            {
                "event_type": etype,
                "n_days": n,
                "level_q": lvl,
                "trend_q": trd,
                "forecast7_q": lvl + 7 * trd,
            }
        ]
    )


def holt_trend_stream(daily: DataFrame) -> DataFrame:
    """Streaming twin of the batch events_holt_linear_forecast fold:
    per event_type, carry Holt's (level, trend) as TWO BIGINTs of
    keyed state across micro-batches. The recurrence is all-integer
    (arithmetic shifts), so — rows applied in day order — the final
    state is EXACTLY the batch fold's, not just within float noise
    (test-pinned). Input is the daily count stream (event_type, day,
    y_q) an upstream windowed aggregate emits; state per key never
    grows: O(|event types|) * 3 BIGINTs at any stream length, the
    same monitoring shape as ewma_trend_stream but trend-aware."""
    return daily.groupBy("event_type").applyInPandasWithState(
        _holt_update,
        outputStructType=HOLT_OUTPUT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------- burst-DP trend state

BURST_STATE_SCHEMA = StructType(
    [
        StructField("c0", LongType()),
        StructField("c1", LongType()),
        StructField("b0", LongType()),
        StructField("h0", LongType()),
        StructField("b1", LongType()),
        StructField("h1", LongType()),
        StructField("n_hours", LongType()),
    ]
)

BURST_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_hours", LongType()),
        StructField("path_cost_q", LongType()),
        StructField("n_bursts", LongType()),
        StructField("burst_hours", LongType()),
    ]
)


def _burst_update_factory(r0_by_type: dict):
    """The burst DP needs each key's baseline rate r0 — a corpus fact
    computed ONCE upstream (batch aggregate) and closed over here,
    exactly how production stream jobs ship model parameters."""

    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (etype,) = key
        r0 = int(r0_by_type[etype])
        if state.exists:
            c0, c1, b0, h0, b1, h1, n = state.get
        else:
            c0 = c1 = b0 = h0 = b1 = h1 = None
            n = 0
        rows = pd.concat(list(pdfs)).sort_values("h")
        for y in rows["y"]:
            y = int(y)
            if c0 is None:
                # the IDENTICAL init of the batch fold
                c0, c1 = abs(y - r0), r0 + abs(y - 2 * r0)
                b0, h0, b1, h1 = 0, 0, 1, 1
            else:
                nc0 = min(c0, c1) + abs(y - r0)
                nc1 = min(c1, c0 + r0) + abs(y - 2 * r0)
                nb0, nh0 = (b0, h0) if c0 <= c1 else (b1, h1)
                nb1, nh1 = (
                    (b1, h1 + 1) if c1 <= c0 + r0 else (b0 + 1, h0 + 1)
                )
                c0, c1, b0, h0, b1, h1 = nc0, nc1, nb0, nh0, nb1, nh1
            n += 1
        state.update((c0, c1, b0, h0, b1, h1, n))
        best0 = c0 <= c1
        yield pd.DataFrame(
            [
                {
                    "event_type": etype,
                    "n_hours": n,
                    "path_cost_q": c0 if best0 else c1,
                    "n_bursts": b0 if best0 else b1,
                    "burst_hours": h0 if best0 else h1,
                }
            ]
        )

    return _update


def burst_segmentation_stream(
    hourly: DataFrame, r0_by_type: dict
) -> DataFrame:
    """Streaming twin of the batch events_burst_segmentation Viterbi
    fold: per event_type, the 2-state DP's (cost, n_bursts, dwell)
    triples ride as SEVEN BIGINTs of keyed state — all-integer, so
    rows applied in hour order land EXACTLY on the batch fold
    (test-pinned). ``r0_by_type`` is the per-key baseline rate, a
    corpus fact broadcast like any model parameter. O(|event types|)
    state at any stream length — burst MONITORING, not reprocessing."""
    return hourly.groupBy("event_type").applyInPandasWithState(
        _burst_update_factory(r0_by_type),
        outputStructType=BURST_OUTPUT_SCHEMA,
        stateStructType=BURST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
