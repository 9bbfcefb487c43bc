#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each SparkEntry query result (parquet written by graft.Verify) against
the DuckDB oracle SQL (oracle_sql.json) over the same testdata tables,
comparing schema (column names), row count, and values (sorted columns +
sorted rows; floats with tolerance so we catch real bugs, not ulps).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [onlyCsv]
onlyCsv: optional comma-separated query-name filter (for per-query timeout
driving at large scale factors, where some all-pairs oracles are non-poly).
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        return round(v, 6) + 0.0  # + 0.0 folds IEEE -0.0 into +0.0 so the
        # row sort cannot separate equal-valued rows by zero sign
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def rows_of(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    return cols, sorted(zip(*data), key=lambda r: tuple(str(norm(x)) for x in r)) if data else (cols, [])


def close(a, b):
    if isinstance(a, float) and isinstance(b, (float, int)):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-6 + 1e-9 * max(abs(a), abs(b))
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))
    return norm(a) == norm(b)


def main(sf_dir, out_dir, only=None):
    import os
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import glob, os
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p))
    if only:
        names = [n for n in names if n in only]
    for name in names:
        try:
            got = pq.read_table(glob.glob(f"{out_dir}/{name}/*.parquet")[0] if glob.glob(f"{out_dir}/{name}/*.parquet") else f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            failures += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only check: rows={got.num_rows})")
            if got.num_rows == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        gc, gr = rows_of(got)
        ec, er = rows_of(exp)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            failures += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
            failures += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(gr, er)):
            if not all(close(a, b) for a, b in zip(g, e)):
                bad = (i, g, e)
                break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(gr)} rows")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'} / {len(names)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
