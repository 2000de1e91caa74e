"""Data-driven attribution suite: Markov removal effect + exact
Shapley. The oracle hash gate proves cross-engine determinism; these
pin the MODEL-level invariants the formulas promise."""

from __future__ import annotations

from cnc_visionsearch_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_markov_removal_monotone_and_normalized(spark):
    """Removing a channel can only LOWER absorption probability
    (contributions are non-negative and floor division is monotone),
    and the ppm shares sum to 1e6 up to per-channel floor loss."""
    rows = all_queries()["events_markov_removal_attribution"](
        spark, SF
    ).collect()
    assert len(rows) == 4
    base = {r.p_base_q for r in rows}
    assert len(base) == 1  # same base conversion on every row
    for r in rows:
        assert 0 <= r.p_removed_q <= r.p_base_q
        assert r.removal_q == r.p_base_q - r.p_removed_q
    total_ppm = sum(r.attr_ppm for r in rows)
    assert 1_000_000 - 4 <= total_ppm <= 1_000_000


def test_shapley_efficiency_telescopes(spark):
    """Sum of Shapley numerators telescopes to 24*(v(C) - v(empty))
    with v=0 for unobserved coalitions — the efficiency axiom in the
    exact integer domain."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from cnc_visionsearch_spark.queries_events import (
        _ATTR_SCALE,
        _SHAP_BITS,
    )
    from cnc_visionsearch_spark.sources.catalog import load_table

    rows = all_queries()["events_shapley_attribution"](spark, SF).collect()
    assert {r.channel for r in rows} == set(_SHAP_BITS)

    # recompute v(full) and v(empty) independently
    ev = load_table(spark, SF, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    prior = F.sum(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, -1))
    j = ev.withColumn("pp", F.coalesce(prior, F.lit(0))).filter(
        F.col("pp") == 0
    )
    mask = sum(
        F.max(F.when(F.col("event_type") == ch, F.lit(b)).otherwise(0))
        for ch, b in _SHAP_BITS.items()
    )
    u = j.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("conv"),
        mask.cast("bigint").alias("mask"),
    )
    stats = {
        int(r.mask): (int(r.users), int(r.convs))
        for r in u.groupBy("mask")
        .agg(
            F.count(F.lit(1)).alias("users"), F.sum("conv").alias("convs")
        )
        .collect()
    }

    def v(m):
        if m not in stats:
            return 0
        users, convs = stats[m]
        return (convs * _ATTR_SCALE) // users

    full = sum(_SHAP_BITS.values())
    assert sum(r.phi_num_q for r in rows) == 24 * (v(full) - v(0))
