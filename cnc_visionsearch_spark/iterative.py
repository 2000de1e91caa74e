"""Budget guard for driver-coordinated iterative loops.

A handful of operators iterate on the DRIVER (BPE merge training,
PageRank power iterations, bounded-hop BFS, Lloyd k-means): each round
launches Spark jobs, and the loop bound is planner state. These loops
are deterministic and oracle-replayed, but a copied-and-edited query
that cranks the round count turns "a few bounded jobs" into an
unbounded job storm on a shared cluster. ``check_rounds`` is the
single choke point: every parameterized iterative query validates its
round count here, so the budget policy lives in one place.

The cap is deliberately generous (production PageRank converges in
<= 10 iterations; BPE oracles unroll one CTE block per round and
DuckDB planning degrades past ~16 blocks) — it exists to reject
typo-scale values (0, negatives, 10_000), not to tune convergence.
"""

from __future__ import annotations

MAX_DRIVER_ROUNDS = 16


def check_rounds(n: int, what: str) -> int:
    """Validate a driver-loop round count; returns ``n`` for inline use.

    Raises ``ValueError`` unless ``1 <= n <= MAX_DRIVER_ROUNDS``. ``n``
    must be a real int (bools are rejected — ``True`` silently meaning
    "one round" is a bug, not a convenience).
    """
    if isinstance(n, bool) or not isinstance(n, int):
        raise ValueError(f"{what}: round count must be an int, got {n!r}")
    if not 1 <= n <= MAX_DRIVER_ROUNDS:
        raise ValueError(
            f"{what}: round count {n} outside the driver-loop budget "
            f"[1, {MAX_DRIVER_ROUNDS}] — each round launches Spark jobs; "
            "raise MAX_DRIVER_ROUNDS deliberately if a workload truly "
            "needs more"
        )
    return n
