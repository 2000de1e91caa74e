"""Isolated final-action wall for customer_pareto_coverage (r9 verdict
#5): separate the rank kernel's CONSTRUCTION collects (memoized after
the first build) from the final window job the bench row actually
pays steady-state. Prints one JSON line; SCALE.md cites it."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cnc_visionsearch_spark.registry import all_queries
from cnc_visionsearch_spark.session import get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="pareto_wall")
    from pyspark.sql import functions as F

    warm = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    warm.write.format("noop").mode("overwrite").save()
    fn = all_queries()["customer_pareto_coverage"]

    # pass 0: cold — pays the construction collects + the final job
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    cold = round(time.perf_counter() - t0, 3)

    # passes 1..4: memo hits — construction is zero jobs, so the wall
    # IS the final action (scan + banded window + broadcast agg)
    walls = []
    for _ in range(4):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        constructed = round(time.perf_counter() - t0, 3)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        walls.append(
            {
                "construct_s": constructed,
                "final_action_s": round(time.perf_counter() - t1, 3),
            }
        )
    print(
        json.dumps(
            {
                "query": "customer_pareto_coverage",
                "sf_dir": sf_dir,
                "cold_total_s": cold,
                "warm_passes": walls,
                "min_final_action_s": min(w["final_action_s"] for w in walls),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
