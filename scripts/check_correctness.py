"""Driver-mimic correctness check: run every queries() entry on Spark
and its oracle_sql() on DuckDB over the same parquet, compare
row-count + column names + order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [query-prefix ...]

Args containing "/" select the sf_dir (default /root/testdata/sf0.01);
anything else filters queries by name prefix.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from cnc_visionsearch_spark.schemas import ALL_TABLES  # noqa: E402
from cnc_visionsearch_spark.session import get_session  # noqa: E402


def canon_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(canon_value(vals[i]) for i in idx))
    return sorted(out)


def main() -> int:
    dirs = [a for a in sys.argv[1:] if "/" in a]
    sf_dir = dirs[0] if dirs else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_session()
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and not any(name.startswith(p) for p in only):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak {name}: rows={len(srows)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            cs = canon_rows(scols, [[row[c] for c in scols] for row in srows])
            cd = canon_rows(dcols, drows)
            if cs != cd:
                diffs = [
                    (a, b) for a, b in zip(cs, cd) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
