"""Local replica of the driver's correctness gate.

Runs every queries() entry at a given sf_dir via Spark AND its
oracle_sql() via DuckDB, then compares row count, column names, and
values (order-insensitive, exact for strings/ints, tight tolerance
report for floats so near-misses are visible before the driver's
hash-compare flags them).

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from octopufs_spark.session import get_spark  # noqa: E402
from octopufs_spark.tables import TABLE_NAMES  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def normalize(rows: list[tuple], cols: list[str]):
    """Sort columns by name, then sort rows, stringify values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_val(v):
        if v is None:
            return "<NULL>"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return str(v)

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(out), [cols[i] for i in order]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    failures: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            n_weak += 1
            continue
        try:
            res = con.sql(oracles[name])
            ocols = res.columns
            orows = [tuple(r) for r in res.fetchall()]
        except Exception:
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            n_fail += 1
            failures.append(name)
            continue
        s_norm, s_cols = normalize(srows, scols)
        o_norm, o_cols = normalize(orows, ocols)
        ok = True
        msgs = []
        if s_cols != o_cols:
            ok = False
            msgs.append(f"cols spark={s_cols} duck={o_cols}")
        if len(s_norm) != len(o_norm):
            ok = False
            msgs.append(f"rowcount spark={len(s_norm)} duck={len(o_norm)}")
        elif s_norm != o_norm:
            ok = False
            diff = [(a, b) for a, b in zip(s_norm, o_norm) if a != b][:3]
            msgs.append(f"values differ, first diffs: {diff}")
        if ok:
            print(f"pass  {name}: rows={len(s_norm)} ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: " + "; ".join(msgs))
            n_fail += 1
            failures.append(name)
    print(f"\n== pass={n_pass} weak={n_weak} fail={n_fail}")
    if failures:
        print("failed:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
