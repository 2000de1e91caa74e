"""Semantic invariants of the round-5 operators, checked at sf0.001
(the hash gates pin VALUES; these pin the CLAIMS the docstrings make)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cnc_visionsearch_spark.queries_analytics import events_ab_power_mde
from cnc_visionsearch_spark.queries_hybrid import (
    hybrid_ta_stop_depth,
    text_bm25_ndcg_eval,
    text_static_prune_overlap,
)
from cnc_visionsearch_spark.queries_ann_trained import (
    ann_opq_dim_balance_distortion,
)
from cnc_visionsearch_spark.queries_relational import (
    orders_cdc_merge_report,
    orders_open_backlog_peaks,
    part_ktruss_edges,
    part_lpa_communities,
    _TRUSS_K,
)
from cnc_visionsearch_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_ta_certification_is_sound(spark):
    """At any certified depth, TA's guarantee holds by its own numbers:
    the k-th best seen combined score bounds every unseen doc's best
    possible score (kth >= tau). Also: tau is non-increasing in depth
    (prefix minima), and n_seen is non-decreasing."""
    rows = sorted(
        hybrid_ta_stop_depth(spark, SF).collect(), key=lambda r: r.depth
    )
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert b.tau_q <= a.tau_q, "tau must not rise with depth"
        assert b.n_seen >= a.n_seen
    for r in rows:
        if r.certified:
            assert r.kth_q is not None and r.kth_q >= r.tau_q
    # the deepest probe must certify on the fixture (lists exhausted)
    assert rows[-1].certified


def test_static_prune_kept_counts_monotone(spark):
    """More keep-percentage can only keep more postings; overlap is a
    top-10 intersection so it is bounded by 10."""
    rows = sorted(
        text_static_prune_overlap(spark, SF).collect(),
        key=lambda r: r.keep_pct,
    )
    assert [r.keep_pct for r in rows] == [25, 50, 75]
    for a, b in zip(rows, rows[1:]):
        assert b.n_postings_kept >= a.n_postings_kept
    for r in rows:
        assert 0 <= r.overlap_at_10 <= 10
        assert r.n_postings_kept <= r.n_postings_full


def test_ndcg_in_unit_interval_and_ideal_dominates(spark):
    r = text_bm25_ndcg_eval(spark, SF).collect()[0]
    assert r.idcg_q >= r.dcg_q > 0
    assert 0.0 < r.ndcg_at_10 <= 1.0


def test_opq_balanced_assignment_narrows_energy_spread(spark):
    """The energy-snake assignment exists to narrow the per-subspace
    energy spread vs contiguous grouping (the OPQ motivation). Pinned
    on the fixture (deterministic), plus: total energy and total
    distortion mass are grouping-invariant / comparable."""
    rows = ann_opq_dim_balance_distortion(spark, SF).collect()
    assert len(rows) == 8
    ec = [r.energy_q_contig for r in rows]
    eb = [r.energy_q_balanced for r in rows]
    assert sum(ec) == sum(eb), "a permutation cannot change total energy"
    assert (max(eb) - min(eb)) <= (max(ec) - min(ec))


def test_lpa_is_a_partition_of_the_node_set(spark):
    """Every co-purchase node lands in exactly one community and none
    are dropped: the FULL label assignment has one row per node of the
    edge set, and community sizes sum to the node count."""
    from cnc_visionsearch_spark.queries_relational import (
        _copurchase_edges,
        _lpa_labels,
    )

    li = load_table(spark, SF, "lineitem")
    n_nodes = _copurchase_edges(li).select("src").distinct().count()
    # materialize the label fixed point ONCE — three actions follow
    labels = _lpa_labels(spark, SF).localCheckpoint(eager=True)
    assert labels.count() == n_nodes
    assert labels.select("node").distinct().count() == n_nodes
    sizes = labels.groupBy("lab").count().agg(F.sum("count")).first()[0]
    assert sizes == n_nodes
    rows = part_lpa_communities(spark, SF).collect()
    assert rows and sum(r.n_members for r in rows) <= n_nodes
    for r in rows:
        assert r.n_members >= 1
        assert r.min_part <= r.max_part


def test_ktruss_edges_meet_support_floor(spark):
    rows = part_ktruss_edges(spark, SF).collect()
    for r in rows:
        assert r.support >= _TRUSS_K - 2
        assert r.part_a < r.part_b


def test_backlog_never_negative_and_bounded_by_orders(spark):
    n_orders = load_table(spark, SF, "orders").count()
    rows = orders_open_backlog_peaks(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.open_orders <= n_orders


def test_cdc_merge_reconciles(spark):
    r = orders_cdc_merge_report(spark, SF).collect()[0]
    assert r.n_after == r.n_before - r.n_deleted + r.n_inserted
    assert r.n_deleted >= 0 and r.n_updated >= 0 and r.n_inserted >= 0


def test_power_analysis_row_is_sane(spark):
    r = events_ab_power_mde(spark, SF).collect()[0]
    assert 0.0 < r.p_pool < 1.0
    assert r.mde_abs > 0.0
    assert r.n_per_arm_rel10 > 0
