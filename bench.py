#!/usr/bin/env python
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "headline_wall_clock", "value": <total sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop sink (full materialization,
no driver collect bottleneck), timed individually after a single JVM
warm-up action. The headline set spans the whole operator surface:
relational joins/aggs, windows, events analytics, text/dedup, and the
vector-search core (SURVEY §2).
"""

from __future__ import annotations

import json
import os
import sys
import time

from cnc_visionsearch_spark.registry import all_queries
from cnc_visionsearch_spark.session import get_session

HEADLINE = [
    # relational: scan-heavy agg, 3-way and 6-way joins, window top-k
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "top_customers_per_nation",
    # events analytics: tumbling agg, sessionization, rolling windows
    "events_tumbling_hourly",
    "events_sessionize",
    "events_rolling_user_stats",
    # text / dedup: group stats, BPE tokenization, MinHash LSH end-to-end
    "doc_stats_by_lang_source",
    "doc_bpe_token_stats",
    "doc_sequence_packing",
    "minhash_lsh_neardup_pairs",
    # vector core: single-query kNN + metadata join, kNN join, cosine top-k
    "knn_search_with_metadata",
    "knn_join_batch",
    "cosine_topk",
    # ANN + sharded tiers and the text-search endpoint — including the
    # COMPOSED probes the 100 TB design leans on (IVF x PQ x rescore,
    # batch ANN join)
    "ann_ivf_topk",
    "ann_ivf_pq_topk",
    "ann_pq_trained_topk",
    # the production composed default: IVF x TRAINED PQ x rescore
    # (recall gated >= 0.95 — tests/test_ann_trained.py, RECALL.json)
    "ann_ivf_pq_trained_topk",
    "ann_ivf_knn_join",
    "ann_nsw_beam_topk",
    "ann_hnsw_descend_topk",
    "ann_cascade_topk",
    "knn_sharded_topk",
    "text_search_topk",
    # lexical retrieval served from the persisted inverted index
    "text_inverted_bm25_topk",
    # MaxScore/WAND lossless pruned retrieval (r5): the rare+common
    # term mix where impact-ordered pruning carries the ranking shuffle
    "text_maxscore_pruned_topk",
    # percolator / stored-query reverse search (r5): broadcast query
    # table over bucket-pruned postings
    "text_percolator_matches",
    # late-interaction maxsim serving shape (r7): inverted-index
    # candidate pruning, then exact per-token maxsim — zero joins in
    # the scorer
    "text_maxsim_pruned_topk",
    # r8: maxsim batch kNN-join — N queries from ONE pruned postings
    # read, per-token-quantized order-independent reduction
    "text_maxsim_batch_topk",
    # residual-quantizer tier (r5): two-level trained codec probe
    "ann_rq_trained_topk",
    # span-level exact-substring dedup (r5)
    "doc_duplicate_spans",
    # multimodal Arrow plumbing
    "mm_media_metadata",
    # data layout: Morton-key tile profile (the z-order pruning tier)
    "events_zorder_block_stats",
    # warehouse CDC: MERGE INTO decision table via one full outer join (r5)
    "orders_cdc_merge_report",
    # iterative graph: synchronous label propagation, 3 join-agg rounds (r5)
    "part_lpa_communities",
    # ranked-retrieval eval harness: nDCG@10 with exact BIGINT DCG (r5)
    "text_bm25_ndcg_eval",
    # r6: distributed exact NTILE over the ORDERS FACT — the shared
    # rank primitive (operators/rank.py) at its largest benched input
    "order_price_equidepth_histogram",
    # r6: distributed cumulative revenue coverage (customer Pareto)
    "customer_pareto_coverage",
    # r6: the data-quality expectation rollup (3 fact scans + key join)
    "dq_expectation_summary",
    # r6: HyperLogLog registers + estimate (mergeable-sketch family)
    "events_hll_cardinality",
    # r9: the transactional inverted index's full lifecycle (build ->
    # append -> delete -> vacuum -> compact as tlog commits) probed by
    # the same bm25_probe as the legacy layouts; the ensure-builder
    # runs once (pass 1), so min-of-3 measures the snapshot-read probe
    "tlog_inverted_lifecycle_bm25",
    # r10: the graph tier's transactional lifecycle (split-commit build
    # -> meta-entry promotion -> compact as tlog commits) probed by the
    # same hierarchy descent as ann_hnsw_descend_topk; the ensure-
    # builder runs once (pass 1), so min-of-3 measures the
    # snapshot-read descent
    "tlog_hnsw_lifecycle_topk",
    # r11: the shard tier's transactional lifecycle (build -> append ->
    # delete -> vacuum -> compact as tlog commits) probed by the same
    # sharded_topk_persisted as the legacy layouts; the ensure-builder
    # runs once (pass 1), so min-of-3 measures the log-pruned probe
    "tlog_shard_lifecycle_topk",
]


def _loadavg() -> list[float]:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:  # pragma: no cover — non-Linux
        return []


def _calibration_loop() -> float:
    """Fixed single-thread CPU work (~0.2-0.4s on an idle core): md5
    over 1 MiB x 200. Its wall time depends only on how much CPU this
    process actually gets — a MECHANICAL contention probe (r9 verdict
    #5), so a noisy shared-VM window is machine-flagged in the bench
    artifact instead of re-argued from per-query drift every round."""
    import hashlib

    buf = b"\xab" * (1 << 20)
    t0 = time.perf_counter()
    h = hashlib.md5()
    for _ in range(200):
        h.update(buf)
    h.digest()
    return round(time.perf_counter() - t0, 4)


def _parallel_calibration() -> dict:
    """Effective-parallel-cores probe — the dimension the single-thread
    loop cannot see: a shared VM can deliver ONE core at full speed
    while capping AGGREGATE capacity (measured in r10: identical
    single-thread walls, 13 of 32 effective cores, every multi-core
    Spark stage ~1.4x slower). hashlib.md5 releases the GIL on large
    buffers, so ncpu threads of fixed hashing measure actual aggregate
    throughput; effective_cores = ideal-parallel-wall / observed."""
    import hashlib
    import threading

    buf = b"\xab" * (1 << 23)  # 8 MiB per update: GIL released ~always
    h = hashlib.md5()
    t0 = time.perf_counter()
    for _ in range(25):
        h.update(buf)
    h.digest()
    single = time.perf_counter() - t0  # 200 MiB single-thread
    n = os.cpu_count() or 1

    def work():
        hh = hashlib.md5()
        for _ in range(6):
            hh.update(buf)
        hh.digest()

    threads = [threading.Thread(target=work) for _ in range(n)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    per_mb = single / 200.0
    eff = (n * 48.0 * per_mb) / wall if wall > 0 else float("nan")
    return {
        "single_s": round(single, 4),
        "parallel_wall_s": round(wall, 4),
        "effective_cores": round(min(eff, float(n)), 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    loadavg_start = _loadavg()
    calibrations = [_calibration_loop()]
    par_start = _parallel_calibration()  # BEFORE Spark claims threads
    spark = get_session(app_name="bench")
    queries = all_queries()

    # Warm-up: (1) JVM/codegen/noop-sink (~8s of whole-stage-codegen
    # compilation and memory-manager init on the first real aggregate),
    # (2) the Python worker daemons (the first Arrow UDF query otherwise
    # absorbs ~10s of worker spawn across 32 cores).
    import pandas as pd
    from pyspark.sql import functions as F

    warm = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .groupBy("n_regionkey")
        .agg(F.sum(F.col("n_nationkey").cast("decimal(18,6)")).cast("double").alias("s"))
    )
    warm.write.format("noop").mode("overwrite").save()
    (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .repartition(32)
        .groupBy("n_regionkey")
        .applyInPandas(lambda pdf: pdf[["n_nationkey"]], "n_nationkey int")
        .write.format("noop").mode("overwrite").save()
    )

    # Three passes, per-query minimum: single-shot timings on a shared
    # VM see multi-second CPU-steal bursts (identical pure-JVM runs
    # measured 5.9s vs 25s back to back); the minimum reports the
    # plan's actual steady-state cost.
    timings: dict[str, float] = {}
    passes: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for pass_no in range(3):
        calibrations.append(_calibration_loop())
        for name in HEADLINE:
            fn = queries[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 3)
            passes[name].append(elapsed)
            timings[name] = min(timings.get(name, elapsed), elapsed)
            print(f"  pass{pass_no} {name}: {elapsed:.2f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)

    # Measured ANN recall evidence (RECALL.json, outside the timed
    # passes): recall@10 vs exact for the IVF/PQ/LSH tiers at this sf.
    # Never lets a recall hiccup break the headline bench line.
    try:
        from cnc_visionsearch_spark.recall import emit_recall

        emit_recall(spark, sf_dir, os.path.join(os.path.dirname(__file__) or ".", "RECALL.json"))
    except Exception as exc:  # pragma: no cover
        print(f"  RECALL.json emission failed: {exc}", file=sys.stderr)

    # Mechanical contention marker (r9 verdict #5): the fixed-work
    # calibration loop's wall-time spread across the run, plus
    # loadavg at start (BEFORE this bench adds its own load) and end.
    # contended=true when the calibration spread exceeds 1.35x (the
    # same single-thread work took >35% longer in the worst window
    # than the best — CPU steal) or the machine already carried
    # real load before the bench started (> max(2, ncpu/8) runnable
    # tasks on a box where this bench should be alone — measured: a
    # pre-start loadavg of 7.5/32 inflated the whole run ~1.2x
    # uniformly while the calibration spread stayed under 1.13, so
    # the load probe must bite at small absolute values).
    calibrations.append(_calibration_loop())
    par_end = _parallel_calibration()  # Spark idle between jobs here
    loadavg_end = _loadavg()
    cal_spread = (
        round(max(calibrations) / min(calibrations), 3)
        if min(calibrations) > 0
        else None
    )
    ncpu = os.cpu_count() or 1
    eff_cores = min(par_start["effective_cores"], par_end["effective_cores"])
    contended = bool(
        (cal_spread is not None and cal_spread > 1.35)
        or (loadavg_start and loadavg_start[0] > max(2.0, ncpu / 8))
        or eff_cores < 0.6 * ncpu
    )
    result = {
        "metric": "headline_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # raw per-pass timings so variance (shared-VM CPU steal) is
        # visible next to the min-of-3 headline numbers
        "passes": passes,
        "sf": sf,
        "contended": contended,
        "contention": {
            "loadavg_start": loadavg_start,
            "loadavg_end": loadavg_end,
            "calibration_secs": calibrations,
            "calibration_spread": cal_spread,
            "parallel_start": par_start,
            "parallel_end": par_end,
            "effective_cores": eff_cores,
            "ncpu": ncpu,
        },
    }
    # The driver's tail capture is bounded; with 34+ queries the full
    # JSON (timings + passes) can overflow it and the committed BENCH
    # artifact loses its machine-readable headline ("parsed": null in
    # BENCH_r05.json — r5 verdict task #3). So: (a) persist the FULL
    # result to BENCH_RESULT.json at the repo root (committed), and
    # (b) print the compact line (no passes) LAST so the tail always
    # ends with parseable JSON.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_RESULT.json"),
        "w",
    ) as fh:
        json.dump(result, fh, indent=2, sort_keys=True)
    compact = {k: v for k, v in result.items() if k != "passes"}
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
