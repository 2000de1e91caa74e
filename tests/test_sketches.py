"""Sketch-aggregate sanity (the 100 TB one-pass path): approximate
aggregates must land within their documented error of the exact values
— excluded from hash-match by nature, gated here instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cnc_visionsearch_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    ev = load_table(spark, SF, "events")
    exact = ev.select(F.countDistinct("user_id").alias("n")).first().n
    approx = ev.select(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n")
    ).first().n
    assert abs(approx - exact) / exact <= 0.06  # 3x rsd headroom


def test_percentile_approx_close_to_exact(spark):
    o = load_table(spark, SF, "orders")
    exact = o.select(F.percentile("o_totalprice", F.lit(0.5)).alias("p")).first().p
    approx = o.select(
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("p")
    ).first().p
    assert abs(approx - exact) / exact <= 0.01
