#!/usr/bin/env python
"""Skew-stress probe for the rank/salting primitives (r6 verdict #2).

Reproduces the SCALE.md "Skew evidence" numbers: band-size histograms
of operators/rank.distributed_cumsum's boundary-literal banding under
(a) a Zipf-ish synthetic order key (50% of rows share one value) at
sf0.1 fact scale and (b) the real sf0.1 orders table; salt-cell sizes
of operators/skew.salted_join's hash salt under a 90%-hot key; and
repeat-run hash stability of the sf0.1 orders prefix sum.

The balance claim under test: the total-order contract (unique
tie-break column) lets boundaries split INSIDE a hot key value, so no
band holds more than 2x the mean even under heavy key skew.

Usage:
    python scripts/skew_probe.py   # writes SKEW_PROBE.json at repo root
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from cnc_visionsearch_spark.operators.rank import (  # noqa: E402
    DEFAULT_BANDS,
    _band_boundaries,
    _band_expr,
    _norm_order,
    distributed_cumsum,
)
from cnc_visionsearch_spark.session import get_session  # noqa: E402
from cnc_visionsearch_spark.sources.catalog import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def band_histogram(df, order_cols):
    keys = _norm_order(order_cols)
    bnds = _band_boundaries(df, keys, DEFAULT_BANDS)
    sizes = sorted(
        r.n
        for r in df.withColumn("_b", _band_expr(keys, bnds))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(sizes)
    # mean over the CONFIGURED band constant, not over non-empty bands:
    # a degenerate banding (near-constant key collapsing boundaries)
    # must FAIL the balance gate, not vacuously pass with 1 hot band
    mean = total / DEFAULT_BANDS
    return {
        "rows": total,
        "bands": len(sizes),
        "min_band": sizes[0],
        "max_band": sizes[-1],
        "max_over_mean": round(sizes[-1] / mean, 3),
    }


def main() -> None:
    spark = get_session(app_name="skew_probe")
    out: dict = {"sf_dir": SF_DIR, "gate": "max_over_mean <= 2.0"}

    n = 1_500_000
    zipf = spark.range(n).select(
        F.col("id"),
        F.when((F.col("id") % 2) == 0, F.lit(0))
        .otherwise((F.col("id") * 2654435761) % 997)
        .alias("v"),
    )
    out["cumsum_zipf_synthetic"] = band_histogram(zipf, ["v", "id"])

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    out["cumsum_orders"] = band_histogram(
        orders, ["o_totalprice", "o_orderkey"]
    )

    def run_hash():
        rows = (
            distributed_cumsum(
                orders,
                ["o_totalprice", "o_orderkey"],
                sums=[(F.col("o_totalprice"), "cs")],
                rn_col="rn",
            )
            .select("o_orderkey", "rn")
            .orderBy("o_orderkey")
            .limit(100000)
            .collect()
        )
        return hashlib.md5(str([tuple(r) for r in rows]).encode()).hexdigest()

    hashes = [run_hash() for _ in range(3)]
    out["cumsum_repeat_stability"] = {
        "runs": 3,
        "hashes_identical": len(set(hashes)) == 1,
    }

    nf = 1_500_000
    n_salts = 16
    fact = spark.range(0, nf).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    cells = sorted(
        r.c
        for r in fact.filter(F.col("k") == 7)
        .withColumn("_s", F.pmod(F.xxhash64("k", "payload"), F.lit(n_salts)))
        .groupBy("_s")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    cm = sum(cells) / n_salts
    out["salted_join_hot_key"] = {
        "hot_rows": sum(cells),
        "n_salts": n_salts,
        "min_cell": cells[0],
        "max_cell": cells[-1],
        "max_over_mean": round(cells[-1] / cm, 3),
    }

    ok = (
        out["cumsum_zipf_synthetic"]["max_over_mean"] <= 2.0
        and out["cumsum_orders"]["max_over_mean"] <= 2.0
        and out["salted_join_hot_key"]["max_over_mean"] <= 2.0
        and out["cumsum_repeat_stability"]["hashes_identical"]
    )
    out["all_gates_pass"] = ok
    with open(os.path.join(REPO, "SKEW_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, sort_keys=True))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
