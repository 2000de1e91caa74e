"""Plan inspection utilities (SURVEY §4).

The engine has no custom Catalyst rules (none are needed — SURVEY §4
"Custom Catalyst rules needed: none"); this package instead makes the
plans Catalyst produces *observable and assertable*: bench tooling and
tests/test_plans.py use these helpers to pin the physical shapes that
keep each operator viable at 100 TB (no stray Exchange, pushed
predicates, broadcast dims, pruned scans, WindowGroupLimit top-k).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "node_names",
    "has_node",
    "exchange_inputs",
    "pushed_filters",
    "read_schemas",
    "codegen_span_count",
    "broadcast_hinted_inputs",
    "unpartitioned_windows",
    "unbounded_global_windows",
]


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def node_names(df: DataFrame) -> list[str]:
    """Physical operator names in plan-tree order."""
    return re.findall(r"^\(\d+\) (\S+)", formatted_plan(df), re.MULTILINE)


def has_node(df: DataFrame, name: str) -> bool:
    return any(name in n for n in node_names(df))


def exchange_inputs(df: DataFrame) -> list[str]:
    """The `Input [...]` line of every Exchange node — what actually
    crosses each shuffle (the thing to minimize)."""
    lines = formatted_plan(df).splitlines()
    out = []
    for i, ln in enumerate(lines):
        if re.match(r"^\(\d+\) Exchange", ln) and i + 1 < len(lines):
            out.append(lines[i + 1].strip())
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lines of every scan (predicate pushdown proof)."""
    return [
        ln.strip()
        for ln in formatted_plan(df).splitlines()
        if "PushedFilters" in ln
    ]


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan (column-pruning proof)."""
    return [
        ln.split("ReadSchema:", 1)[1].strip()
        for ln in formatted_plan(df).splitlines()
        if "ReadSchema:" in ln
    ]


def broadcast_hinted_inputs(df: DataFrame) -> list[str]:
    """The child-node line under every explicit broadcast ResolvedHint in
    the analyzed logical plan — i.e. what the QUERY AUTHOR forced to
    broadcast, as opposed to what Catalyst/AQE chose to. Scale tests
    assert no fact-scale relation (orders/customer/lineitem columns)
    ever appears here: a forced broadcast of a table that grows with
    the corpus is an OOM at 100 TB regardless of how well it benches
    at test scale.
    """
    text = df._jdf.queryExecution().analyzed().toString()
    lines = text.splitlines()
    out = []
    for i, ln in enumerate(lines):
        if "ResolvedHint" in ln and "BROADCAST" in ln.upper():
            if i + 1 < len(lines):
                out.append(lines[i + 1].strip())
    return out


def codegen_span_count(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen spans (fewer = wider)."""
    ids = re.findall(r"\[codegen id : (\d+)\]", formatted_plan(df))
    return len(set(ids))


# --------------------------------------------------------------------
# Unpartitioned-window detection (the "No Partition Defined" scale trap)
#
# Spark's WindowExec with an empty partition spec moves ALL input rows
# to a single partition (it even logs a warning) — exactly the global
# sort the reference's core top-k operator (main.py:155) exists to
# avoid. The audit needs to tell apart three shapes:
#
#   1. partitioned window           -> fine, scale-parallel
#   2. unpartitioned window whose input is BOUNDED BY CONSTRUCTION
#      (sits directly above a TakeOrderedAndProject / GlobalLimit /
#      LocalTableScan through pass-through nodes) -> fine: the single
#      partition holds <= k constant rows regardless of data size
#   3. unpartitioned window over data-proportional input -> the trap;
#      gated to an explicit allowlist in scripts/plan_audit.py.
#
# In `explain("formatted")`, a WindowExec detail block renders
# `Arguments: [funcs], [orderSpec]` when unpartitioned and
# `Arguments: [funcs], [partitionSpec], [orderSpec]` when partitioned —
# so the top-level bracket-group count distinguishes 1 from 2/3, and
# the tree section (indentation = parent/child) distinguishes 2 from 3.

_PASS_THROUGH_NODES = frozenset(
    {
        "Sort",
        "Exchange",
        "ReusedExchange",
        "AQEShuffleRead",
        "Project",
        "Filter",
        "ColumnarToRow",
        "RowToColumnar",
        "Coalesce",
        "Window",
        "WindowGroupLimit",
        "InputAdapter",
        # NOTE: Generate (explode) is deliberately NOT pass-through —
        # exploding a <= n-row limited input can multiply it by a
        # data-dependent array length, so a window above explode-above-
        # limit is NOT bounded by construction (r6 ADVICE).
    }
)

_BOUNDED_NODES = frozenset(
    {
        "TakeOrderedAndProject",
        "GlobalLimit",
        "CollectLimit",
        "LocalTableScan",
    }
)


def _top_level_bracket_groups(s: str) -> list[str]:
    """Top-level `[...]` group contents (nested brackets don't split)."""
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in s:
        if ch == "[":
            if depth == 0:
                buf = []
            else:
                buf.append(ch)
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
            if depth == 0:
                groups.append("".join(buf))
            else:
                buf.append(ch)
        elif depth > 0:
            buf.append(ch)
    return groups


_ORDER_MARKER = re.compile(r"\b(?:ASC|DESC) NULLS (?:FIRST|LAST)\b")


def _tree_nodes(plan: str) -> list[tuple[int, str, int]]:
    """(indent, node_name, node_id) for every tree line, all sections."""
    out = []
    for ln in plan.splitlines():
        m = re.match(r"^([:+\-*\s]*)\(?\**\s*([A-Za-z][A-Za-z0-9]*)\s*\((\d+)\)\s*$", ln)
        if m:
            out.append((len(m.group(1)), m.group(2), int(m.group(3))))
    return out


def _window_detail_partitioned(plan: str) -> dict[int, bool]:
    """node_id -> True if the Window node has a partition spec."""
    out: dict[int, bool] = {}
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        m = re.match(r"^\((\d+)\) (?:Window|WindowGroupLimit)\b", ln)
        if not m:
            continue
        nid = int(m.group(1))
        for j in range(i + 1, min(i + 8, len(lines))):
            if lines[j].startswith("Arguments:"):
                # Window: [funcs],[part?],[order?] — 1-3 groups depending
                # on which specs exist; WindowGroupLimit:
                # [part?],[order],fn,k. A partition spec group never
                # carries ASC/DESC sort markers; an order spec always
                # does. So the node is PARTITIONED iff any group beyond
                # the funcs group (first group for Window, none for WGL)
                # is marker-free.
                groups = _top_level_bracket_groups(lines[j])
                is_wgl = "WindowGroupLimit" in ln
                specs = groups if is_wgl else groups[1:]
                out[nid] = any(
                    s.strip() and not _ORDER_MARKER.search(s) for s in specs
                )
                break
    return out


def unpartitioned_windows(df_or_plan) -> list[int]:
    """Node ids of unpartitioned Window/WindowGroupLimit nodes."""
    plan = df_or_plan if isinstance(df_or_plan, str) else formatted_plan(df_or_plan)
    return [nid for nid, p in _window_detail_partitioned(plan).items() if not p]


def unbounded_global_windows(df_or_plan) -> list[int]:
    """Node ids of unpartitioned windows over DATA-PROPORTIONAL input —
    the single-partition scale trap. Excludes windows bounded by
    construction (spine reaches TakeOrderedAndProject / GlobalLimit /
    LocalTableScan through pass-through nodes only)."""
    plan = df_or_plan if isinstance(df_or_plan, str) else formatted_plan(df_or_plan)
    unpart = set(unpartitioned_windows(plan))
    if not unpart:
        return []
    tree = _tree_nodes(plan)
    # child of tree[i] = the next line with greater indent
    flagged = []
    seen: set[int] = set()
    for i, (indent, name, nid) in enumerate(tree):
        if nid not in unpart or not (name == "Window" or name == "WindowGroupLimit"):
            continue
        if nid in seen:  # tree lines can repeat across subquery sections
            continue
        seen.add(nid)
        # walk the spine downward through pass-through nodes
        cur_indent, bounded, j = indent, False, i
        while True:
            nxt = None
            for k in range(j + 1, len(tree)):
                if tree[k][0] > cur_indent:
                    nxt = k
                    break
                if tree[k][0] <= indent:
                    break
            if nxt is None:
                break
            n_indent, n_name, _ = tree[nxt]
            if n_name in _BOUNDED_NODES:
                bounded = True
                break
            if n_name not in _PASS_THROUGH_NODES:
                break
            cur_indent, j = n_indent, nxt
        if not bounded:
            flagged.append(nid)
    return flagged
