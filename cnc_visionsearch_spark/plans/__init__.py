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
