#!/usr/bin/env python
"""One command to restore every freshness-gated artifact to green.

The repo's doctrine (enforced by tests/test_registry_window.py's
freshness tests) is that ANY registry change regenerates, in order:

1. ``PLAN_AUDIT.json``    — scripts/plan_audit.py (full-registry plan
   sweep; gates cartesian == 0, batch_eval_python == 0,
   window_no_partition == 0 outside the allowlist). ~4 min.
2. ``CORRECTNESS_FULL.json`` — scripts/check_correctness.py (every
   registered query vs its DuckDB oracle at sf0.01). ~7 min.
3. ``SCALE_METRICS.json`` — scripts/bench_metrics.py (per-headline
   stage-metric deltas at sf0.1) — only needed when bench.py's
   HEADLINE set changes; pass ``--scale-metrics`` to include it.

Each step is a subprocess so one Spark session's state can never leak
into the next measurement, and a failing step stops the chain (the
artifacts must never be half-refreshed).

Usage:
    python scripts/refresh_artifacts.py                 # steps 1-2
    python scripts/refresh_artifacts.py --scale-metrics # steps 1-3
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEPS = [
    ("PLAN_AUDIT.json", [sys.executable, "scripts/plan_audit.py"]),
    (
        "CORRECTNESS_FULL.json",
        [
            sys.executable,
            "scripts/check_correctness.py",
            "--json",
            "CORRECTNESS_FULL.json",
        ],
    ),
]

if "--scale-metrics" in sys.argv[1:]:
    STEPS.append(
        ("SCALE_METRICS.json", [sys.executable, "scripts/bench_metrics.py"])
    )


def main() -> None:
    for artifact, cmd in STEPS:
        t0 = time.time()
        print(f"==> {artifact}: {' '.join(cmd[1:])}", flush=True)
        proc = subprocess.run(cmd, cwd=REPO)
        if proc.returncode != 0:
            print(
                f"FAILED refreshing {artifact} (exit {proc.returncode}) — "
                "artifacts are now possibly inconsistent; fix and re-run.",
                file=sys.stderr,
            )
            sys.exit(proc.returncode)
        print(f"<== {artifact} done in {time.time() - t0:.0f}s", flush=True)
    print("all artifacts refreshed — run pytest tests/test_registry_window.py")


if __name__ == "__main__":
    main()
