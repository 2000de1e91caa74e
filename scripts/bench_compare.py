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
- when exactly ONE side is contended, compares RAW walls ONE-SIDED:
  a contended wall is an UPPER bound on the same code's clean wall
  (contention only adds time), so new_clean > old_contended PROVES a
  regression while new_clean <= old_contended proves nothing — and
  symmetrically a clean-old vs contended-new pair can only prove
  improvements. No linear capacity model is applied to single-query
  walls (their serial fractions make wall x cores/ncpu a fiction);
- when BOTH are contended, CAPACITY-NORMALIZES as a crude bound:
  each wall scaled by its run's ``effective_cores / ncpu``, the
  table explicitly labeled as such — or, when an artifact predates
  the contention probe (no ``contention`` block), the script refuses
  to rate the headline and prints only the raw per-query table it
  does trust, exit 1;
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
    cont_old = bool(old.get("contended"))
    cont_new = bool(new.get("contended"))
    contended = cont_old or cont_new
    eff_agree = (
        cap_old is not None
        and cap_new is not None
        and min(cap_old[0], cap_new[0]) >= 0.8 * max(cap_old[0], cap_new[0])
    )
    trusted = not contended and eff_agree

    # scale factor applied to each side's walls
    k_old = k_new = 1.0
    if trusted:
        mode = "trusted"
    elif cap_old is None or cap_new is None:
        mode = "refused_no_capacity_data"
    elif cont_old != cont_new:
        # exactly one side contended: raw walls, one-sided logic — a
        # contended wall upper-bounds its clean twin, so only one
        # direction of conclusion is sound per pair
        mode = "one_sided"
    elif contended:
        mode = "normalized"
        k_old = cap_old[0] / cap_old[1]
        k_new = cap_new[0] / cap_new[1]
    else:
        # both clean but capacity drifted >20%: raw walls would
        # mislead in an unknowable direction — treat like one-sided
        # with the LOWER-capacity side as the bounded one
        mode = "one_sided"
        cont_old = cap_old[0] < cap_new[0]
        cont_new = not cont_old

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
            "capacity-NORMALIZED crude bound (BOTH contended): "
            f"old walls x {k_old:.3f} (eff {cap_old[0]:.1f}/{cap_old[1]}), "
            f"new walls x {k_new:.3f} (eff {cap_new[0]:.1f}/{cap_new[1]}) — "
            "serial fractions make this a fiction; prefer re-running "
            "either side clean"
        )
    elif mode == "one_sided":
        bounded = "old" if cont_old else "new"
        hdr = (
            f"ONE-SIDED (the {bounded} artifact is contended/lower-"
            "capacity, so its raw walls UPPER-bound its clean walls: "
            + (
                "only regressions are provable — new > old proves "
                "new-slower; new <= old proves nothing"
                if cont_old
                else "only improvements are provable — new <= old "
                "proves new-not-slower; new > old proves nothing"
            )
            + f"; eff {cap_old[0]:.1f} vs {cap_new[0]:.1f} of "
            f"{cap_new[1]})"
        )
    print(f"Comparison mode: {hdr}")
    print()
    one_sided = mode == "one_sided"
    if mode == "trusted":
        cols = "| query | old_s | new_s | ratio |"
    elif one_sided:
        cols = "| query | old_s | new_s | raw_ratio | verdict |"
    else:
        cols = "| query | old_s | new_s | old_norm_s | new_norm_s | ratio |"
    print(cols)
    print("| --- " * (cols.count("|") - 1) + "|")
    tot_old = tot_new = 0.0
    rows = {}
    proven = []
    for q in common:
        a, b = qo[q] * k_old, qn[q] * k_new
        tot_old += a
        tot_new += b
        ratio = b / a if a > 0 else float("inf")
        rows[q] = round(ratio, 3)
        if mode == "trusted":
            print(f"| {q} | {qo[q]:.3f} | {qn[q]:.3f} | {ratio:.2f} |")
        elif one_sided:
            if cont_old:
                hit = qn[q] > qo[q]
                verdict = "REGRESSION (proven)" if hit else "not provable"
            else:
                hit = qn[q] <= qo[q]
                verdict = "not-slower (proven)" if hit else "not provable"
            if hit:
                proven.append(q)
            print(
                f"| {q} | {qo[q]:.3f} | {qn[q]:.3f} | {ratio:.2f} "
                f"| {verdict} |"
            )
        else:
            print(
                f"| {q} | {qo[q]:.3f} | {qn[q]:.3f} | {a:.3f} | {b:.3f} "
                f"| {ratio:.2f} |"
            )
    total_ratio = tot_new / tot_old if tot_old > 0 else float("inf")
    if mode == "trusted":
        print(f"| **common-set total** | | | **{total_ratio:.3f}** |")
    elif one_sided:
        print(
            f"| **common-set total** | {tot_old:.2f} | {tot_new:.2f} | "
            f"**{total_ratio:.3f}** | raw — see mode note |"
        )
    else:
        print(
            f"| **common-set total** | | | {tot_old:.2f} | {tot_new:.2f} "
            f"| **{total_ratio:.3f}** |"
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
    if one_sided:
        summary["one_sided_bounded"] = "old" if cont_old else "new"
        summary["proven"] = proven
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
