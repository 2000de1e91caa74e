"""Freeze the driver's correctness window (VERDICT r3 §Next-round #3).

The driver hash-checks only the FIRST 50 registered queries
(CORRECTNESS_r{N}.json, observed r1-r3). Registration order is dict
insertion order across the module imports in registry._load_all, so an
innocent `@register` added ahead of position 50 would silently evict a
core query from the hard gate. This test pins the window to the exact
r3-verified set: new queries must register AFTER it (new modules import
last in _load_all; new entries inside an existing module go below its
existing registrations only if the module sits entirely past the
window).
"""

from __future__ import annotations

from cnc_visionsearch_spark.registry import all_queries

# CORRECTNESS_r03.json key order — the driver-green window. Do not
# reorder; do not insert. Appending new queries past position 50 is
# always safe.
DRIVER_WINDOW = [
    "knn_single_topk",
    "knn_search_with_metadata",
    "knn_join_batch",
    "cosine_topk",
    "embedding_group_stats",
    "ingest_guard_stats",
    "embedding_int8_quant_report",
    "text_search_topk",
    "next_dense_id",
    "upsert_batch_semantics",
    "health_status",
    "ann_lsh_bucket_histogram",
    "ann_lsh_topk",
    "ann_ivf_cells",
    "ann_ivf_topk",
    "knn_sharded_topk",
    "ann_int8_rescore_topk",
    "ann_ivf_int8_topk",
    "ann_pq_code_histogram",
    "ann_pq_adc_topk",
    "ann_ivf_knn_join",
    "ann_ivf_pq_topk",
    "dedup_exact_groups",
    "minhash_signatures_long",
    "minhash_lsh_neardup_pairs",
    "simhash_sketches",
    "ngram_jaccard_pairs",
    "embedding_neardup_top10",
    "neardup_cluster_keepers",
    "embedding_neardup_lsh_bucketed",
    "simhash_neardup_pairs",
    "dedup_incremental_batch",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "top_customers_per_nation",
    "rollup_order_stats",
    "customers_without_orders",
    "set_ops_buyer_segments",
    "point_lookup_customer",
    "q6_forecast_revenue",
    "q4_order_priority",
    "q7_volume_shipping",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q13_customer_distribution",
    "q2_min_cost_supplier",
    "q15_top_supplier",
]


def test_correctness_full_artifact_fresh_and_green():
    """The committed full-surface artifact (CORRECTNESS_FULL.json — all
    registered queries vs their DuckDB oracles at sf0.01, driver file
    format) must cover EXACTLY the current registry and be all-green.
    The driver's own CORRECTNESS_r{N}.json hard-gates only the first-50
    window; this pins a machine-checked artifact for the rest. Adding or
    renaming a query without regenerating fails here — regenerate with:
    python scripts/check_correctness.py --json CORRECTNESS_FULL.json"""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_FULL.json")
    assert os.path.exists(path), "missing CORRECTNESS_FULL.json — regenerate"
    with open(path) as fh:
        data = json.load(fh)
    assert set(data) == set(all_queries()), (
        "CORRECTNESS_FULL.json is stale vs the registry — regenerate: "
        f"only_in_artifact={sorted(set(data) - set(all_queries()))[:5]} "
        f"only_in_registry={sorted(set(all_queries()) - set(data))[:5]}"
    )
    bad = {
        n: r
        for n, r in data.items()
        if r["err"] is not None
        or not (r["rows_match"] and r["schema_match"] and r["hash_match"])
    }
    assert not bad, f"non-green entries: {sorted(bad)[:10]}"


def test_stream_bench_artifact_present_and_sane():
    """STREAM_BENCH.json (scripts/bench_streaming.py) records measured
    per-micro-batch serving latency for both serving streams — the
    committed evidence SCALE.md's serving row cites."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "STREAM_BENCH.json")
    assert os.path.exists(path), "missing STREAM_BENCH.json — regenerate"
    with open(path) as fh:
        data = json.load(fh)
    for key in ("knn_serving", "bm25_serving", "percolator", "hll_sketch"):
        stats = data[key]
        assert stats["n_batches"] > 0
        assert stats["median_ms"] > 0 and stats["p95_ms"] >= stats["median_ms"]


def test_scale_metrics_artifact_present_and_claims_hold():
    """SCALE_METRICS.json (scripts/bench_metrics.py) records measured
    per-headline-query stage-metric deltas — input / shuffle / spill
    bytes. The point is to pin SCALE.md's flagship physical claims with
    NUMBERS, not plan text:

    - q1's physical story after the r11 spread_scan (guide §2.5): the
      one deliberate exchange shuffles the filtered scan output ONCE
      (bounded by the lineitem bytes it reads — never amplified), and
      the aggregation itself still reduces map-side (every OTHER
      exchange — the post-partial-agg rows — stays tiny).
    - MinHash LSH dedup shuffles SKETCHES, not documents: its
      shuffle-write is below the corpus's uncompressed text volume
      (what a doc-carrying shuffle would move).
    - the IVF probe partition-prunes: its steady-state read volume is a
      tiny slice of the embeddings table's on-disk size.
    - nothing in the headline set spills to disk at bench sf (the
      partitions-fit-in-memory sizing claim).
    """
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "SCALE_METRICS.json")
    assert os.path.exists(path), "missing SCALE_METRICS.json — regenerate"
    with open(path) as fh:
        data = json.load(fh)
    qs = data["queries"]
    # covers the full headline set of the committed bench
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    assert set(qs) >= set(bench.HEADLINE), sorted(set(bench.HEADLINE) - set(qs))
    for name, m in qs.items():
        for k, v in m.items():
            if k == "stage_shuffle_write_bytes":
                assert all(x >= 0 for x in v), f"{name}.{k} negative: {v}"
                continue
            assert v >= 0, f"{name}.{k} negative: {v}"
    text_bytes = data["documents_text_bytes"]
    emb_bytes = data["table_bytes"]["embeddings"]
    q1 = qs["q1_pricing_summary"]
    # the spread_scan exchange moves the filtered scan output once,
    # bounded by lineitem's on-disk footprint (no amplification) ...
    assert q1["shuffle_write_bytes"] < data["table_bytes"]["lineitem"]
    # ... and every other exchange (the post-partial-agg rows) is tiny:
    # the map-side reduction story holds for the aggregation itself
    stage_sw = sorted(q1["stage_shuffle_write_bytes"], reverse=True)
    assert sum(stage_sw[1:]) < 256 * 1024, stage_sw
    assert qs["minhash_lsh_neardup_pairs"]["shuffle_write_bytes"] < text_bytes
    assert qs["ann_ivf_topk"]["input_bytes"] < emb_bytes / 10
    assert all(m["disk_spill_bytes"] == 0 for m in qs.values())


def test_plan_audit_artifact_covers_registry_and_gates_hold():
    """PLAN_AUDIT.json (scripts/plan_audit.py) sweeps EVERY registered
    query's physical plan. tests/test_plans.py hand-pins ~50 flagship
    shapes; this artifact machine-checks the three registry-wide gates —
    zero CartesianProduct nodes, zero row-at-a-time Python UDF nodes
    (BatchEvalPython), and zero unpartitioned WindowExec over
    data-proportional input (window_no_partition; windows above a
    limit/LocalTableScan are bounded by construction and exempt, and
    the few justified dimension-bounded sites live in
    scripts/plan_audit.WINDOW_ALLOWLIST) — so a scale-killer in ANY
    query, benched or not, is a committed-diff away from visible."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "PLAN_AUDIT.json")
    assert os.path.exists(path), "missing PLAN_AUDIT.json — regenerate"
    with open(path) as fh:
        data = json.load(fh)
    assert not data["failures"], data["failures"]
    qs = data["queries"]
    assert set(qs) == set(all_queries()), (
        "PLAN_AUDIT.json is stale vs the registry — regenerate: "
        f"only_in_artifact={sorted(set(qs) - set(all_queries()))[:5]} "
        f"only_in_registry={sorted(set(all_queries()) - set(qs))[:5]}"
    )
    cartesian = {n for n, m in qs.items() if m["cartesian"]}
    row_python = {n for n, m in qs.items() if m["batch_eval_python"]}
    assert not cartesian, f"CartesianProduct in: {sorted(cartesian)}"
    assert not row_python, f"row-at-a-time Python in: {sorted(row_python)}"

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "plan_audit",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "plan_audit.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    allow = set(mod.WINDOW_ALLOWLIST)
    global_windows = {
        n for n, m in qs.items() if m.get("window_no_partition")
    }
    assert global_windows <= allow, (
        "unpartitioned WindowExec over data-proportional input in: "
        f"{sorted(global_windows - allow)} — use operators/rank "
        "primitives (global_topn / distributed_cumsum / exact_ntile) "
        "or justify in scripts/plan_audit.WINDOW_ALLOWLIST"
    )
    stale_allow = allow - global_windows
    assert not stale_allow, (
        f"WINDOW_ALLOWLIST entries no longer needed: {sorted(stale_allow)}"
    )


def test_first_50_registrations_match_driver_window():
    names = list(all_queries())
    assert len(names) >= 50
    assert names[:50] == DRIVER_WINDOW, (
        "the driver's 50-query correctness window changed — a new "
        "registration landed ahead of position 50 and evicted a "
        "driver-green query from the hard gate. Register new queries "
        "after the window (a module imported last in "
        "registry._load_all)."
    )
