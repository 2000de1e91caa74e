#!/usr/bin/env python
"""Build every derived index/layout for a corpus in one pass — the
"indexing job" a deployment schedules after each corpus version lands
(the batch analog of the reference's index build at startup,
/root/reference/main.py:55-66, generalized to every tier).

Usage:
    python scripts/build_indexes.py [sf_dir]    # default sf0.01

Builds (all idempotent, content-fingerprint keyed — a re-run on an
unchanged corpus is a no-op):
  - IVF cell-partitioned layout (stride codebook) + PQ code table
  - TRAINED coarse-quantizer IVF layout
  - TRAINED per-subspace PQ codebook + code table
  - appended-lifecycle demo layout (head-trained, tail-appended)
  - sharded local-index layout (FAISS artifacts when faiss installed)
  - hyperplane-LSH bucket-partitioned layout
  - NSW graph layout (bucket-partitioned kNN graph + entry points)
  - encoded text index
  - inverted text index (term-bucket-partitioned postings)
  - banded-MinHash dedup blocking table
  - daily orders rollup (the serving aggregate)

Prints ONE JSON line: per-artifact path + wall-clock seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from cnc_visionsearch_spark.queries_ann import (
        ensure_ivf_built,
        ensure_pq_built,
        ensure_shards_built,
    )
    from cnc_visionsearch_spark.queries_ann_incremental import ensure_lsh_built
    from cnc_visionsearch_spark.queries_ann_trained import (
        ensure_ivf_trained_built,
        ensure_pq_trained_appended,
        ensure_pq_trained_built,
    )
    from cnc_visionsearch_spark.queries_ann_graph import ensure_nsw_built
    from cnc_visionsearch_spark.queries_analytics import (
        ensure_daily_rollup_built,
        ensure_inverted_built,
    )
    from cnc_visionsearch_spark.queries_dedup import ensure_minhash_built
    from cnc_visionsearch_spark.service import ensure_text_index_built
    from cnc_visionsearch_spark.session import get_session

    spark = get_session(app_name="build_indexes")
    steps = [
        ("ivf", lambda: ensure_ivf_built(spark, sf_dir, n_cells=8)),
        ("pq", lambda: ensure_pq_built(spark, sf_dir)),
        ("ivf_trained", lambda: ensure_ivf_trained_built(spark, sf_dir)),
        ("pq_trained", lambda: ensure_pq_trained_built(spark, sf_dir)),
        ("pq_trained_appended", lambda: ensure_pq_trained_appended(spark, sf_dir)),
        ("shards", lambda: ensure_shards_built(spark, sf_dir)),
        ("lsh", lambda: ensure_lsh_built(spark, sf_dir)),
        ("nsw", lambda: ensure_nsw_built(spark, sf_dir)),
        ("text_index", lambda: ensure_text_index_built(spark, sf_dir)),
        ("inverted", lambda: ensure_inverted_built(spark, sf_dir)),
        ("minhash", lambda: ensure_minhash_built(spark, sf_dir)),
        ("daily_rollup", lambda: ensure_daily_rollup_built(spark, sf_dir)),
    ]
    report: dict = {"sf_dir": sf_dir, "artifacts": {}}
    for name, fn in steps:
        t0 = time.perf_counter()
        path = fn()
        report["artifacts"][name] = {
            "path": path,
            "sec": round(time.perf_counter() - t0, 2),
        }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
