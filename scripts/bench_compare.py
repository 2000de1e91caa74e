#!/usr/bin/env python
"""Mechanical round-over-round bench comparison (r10 verdict #4).

Prose reconciliation of bench walls across rounds kept smuggling an
untestable judgment call: "the machine was busy, so trust the ratio
anyway". This script makes the capacity rule CODE. Given two BENCH
artifacts (the one-line bench.py JSON, or the driver's wrapper with a
``parsed`` key), it:

- REFUSES the comparison outright when the artifacts measured
  different scale factors (nothing to compare);
- classifies the pair as TRUSTED only when NEITHER artifact
  self-flags ``contended`` AND their measured ``effective_cores``
  agree within 20% (same delivered capacity on both sides);
- otherwise CAPACITY-NORMALIZES: each wall is scaled by its own run's
  ``effective_cores / ncpu`` (a run that got 8.7 of 32 advertised
  cores has its walls deflated to the capacity-clean estimate), and
  the table is explicitly labeled normalized — or, when an artifact
  predates the contention probe (no ``contention`` block), the script
  refuses to rate the headline and prints only the raw per-query
  table it does trust, exit 1;
- prints the per-query markdown table (raw seconds, normalized
  seconds when applicable, new/old ratio) over the COMMON query set,
  lists queries present in only one artifact, and ends with ONE JSON
  summary line for machine consumption.

Exit codes: 0 trusted or normalized comparison printed; 1 comparison
refused (missing capacity data); 2 artifacts not comparable (sf
mismatch / unreadable).

Usage:
    python scripts/bench_compare.py BENCH_r10.json BENCH_r11.json
"""

from __future__ import annotations

import json
import sys


def load_artifact(path: str) -> dict:
    """Accept both shapes: bench.py's one-line JSON and the driver's
    wrapper whose ``parsed`` key holds that JSON."""
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d or "value" not in d:
        raise ValueError(f"{path}: not a bench artifact (no queries/value)")
    return d


def capacity(d: dict) -> "tuple[float, int] | None":
    """(effective_cores, ncpu) from the contention probe, or None for
    artifacts that predate it — those cannot be normalized."""
    c = d.get("contention")
    if not isinstance(c, dict):
        return None
    eff = c.get("effective_cores")
    ncpu = c.get("ncpu")
    if not isinstance(eff, (int, float)) or not isinstance(ncpu, int):
        return None
    return float(eff), ncpu


def compare(old: dict, new: dict) -> "tuple[int, dict]":
    if old.get("sf") != new.get("sf"):
        print(
            f"REFUSED: scale factors differ (old sf={old.get('sf')}, "
            f"new sf={new.get('sf')}) — walls are not comparable."
        )
        return 2, {"status": "refused_sf_mismatch"}

    cap_old, cap_new = capacity(old), capacity(new)
    contended = bool(old.get("contended")) or bool(new.get("contended"))
    eff_agree = (
        cap_old is not None
        and cap_new is not None
        and min(cap_old[0], cap_new[0]) >= 0.8 * max(cap_old[0], cap_new[0])
    )
    trusted = not contended and eff_agree

    # scale factor applied to each side's walls
    if trusted:
        mode = "trusted"
        k_old = k_new = 1.0
    elif cap_old is not None and cap_new is not None:
        mode = "normalized"
        k_old = cap_old[0] / cap_old[1]
        k_new = cap_new[0] / cap_new[1]
    else:
        mode = "refused_no_capacity_data"

    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))

    if mode == "refused_no_capacity_data":
        print(
            "REFUSED to rate the headline: at least one artifact has no "
            "contention/effective_cores probe, and "
            f"contended={contended} — capacity normalization is "
            "impossible. Raw per-query walls below are reported but NOT "
            "rated."
        )
        print()
        print("| query | old_s | new_s |")
        print("| --- | --- | --- |")
        for q in common:
            print(f"| {q} | {qo[q]:.3f} | {qn[q]:.3f} |")
        return 1, {"status": mode, "common": len(common)}

    hdr = "capacity-TRUSTED (both clean, effective_cores within 20%)"
    if mode == "normalized":
        hdr = (
            "capacity-NORMALIZED (contended or capacity drift >20%): "
            f"old walls x {k_old:.3f} (eff {cap_old[0]:.1f}/{cap_old[1]}), "
            f"new walls x {k_new:.3f} (eff {cap_new[0]:.1f}/{cap_new[1]})"
        )
    print(f"Comparison mode: {hdr}")
    print()
    cols = (
        "| query | old_s | new_s | ratio |"
        if mode == "trusted"
        else "| query | old_s | new_s | old_norm_s | new_norm_s | ratio |"
    )
    print(cols)
    print("| --- " * (cols.count("|") - 1) + "|")
    tot_old = tot_new = 0.0
    rows = {}
    for q in common:
        a, b = qo[q] * k_old, qn[q] * k_new
        tot_old += a
        tot_new += b
        ratio = b / a if a > 0 else float("inf")
        rows[q] = round(ratio, 3)
        if mode == "trusted":
            print(f"| {q} | {qo[q]:.3f} | {qn[q]:.3f} | {ratio:.2f} |")
        else:
            print(
                f"| {q} | {qo[q]:.3f} | {qn[q]:.3f} | {a:.3f} | {b:.3f} "
                f"| {ratio:.2f} |"
            )
    total_ratio = tot_new / tot_old if tot_old > 0 else float("inf")
    print(
        f"| **common-set total** | | | "
        + (f"**{total_ratio:.3f}** |" if mode == "trusted"
           else f"{tot_old:.2f} | {tot_new:.2f} | **{total_ratio:.3f}** |")
    )
    if only_old:
        print(f"\nOnly in old artifact ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"\nOnly in new artifact ({len(only_new)}): {', '.join(only_new)}")
    summary = {
        "status": mode,
        "sf": new.get("sf"),
        "common": len(common),
        "total_old_s": round(tot_old, 3),
        "total_new_s": round(tot_new, 3),
        "total_ratio": round(total_ratio, 4),
        "per_query_ratio": rows,
        "only_old": only_old,
        "only_new": only_new,
    }
    return 0, summary


def main(argv: "list[str]") -> int:
    if len(argv) != 3:
        print(__doc__)
        return 2
    try:
        old, new = load_artifact(argv[1]), load_artifact(argv[2])
    except (OSError, ValueError, json.JSONDecodeError) as e:
        print(f"REFUSED: {e}")
        return 2
    rc, summary = compare(old, new)
    print()
    print(json.dumps(summary, sort_keys=True))
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv))
