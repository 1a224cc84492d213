#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (NOT shipped library
code): reads each parquet result dumped by graft.Verify, runs the matching
oracle SQL in DuckDB over the same fixture tables, and compares
(columns sorted by name, rows sorted, values exact; floats compared by
bit pattern with a small report of any diffs).

Usage: python3 tools/localverify.py <sfDir> <outDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(("f", repr(v)))
            elif hasattr(v, "isoformat"):
                vals.append(("t", v.isoformat()))
            else:
                vals.append((type(v).__name__, str(v)))
        out.append(tuple(vals))
    out.sort()
    return [c for c in sorted(cols)], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir, name)
        if not res_dir.exists():
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        got_rel = con.query(f"SELECT * FROM '{res_dir}/*.parquet'")
        got_cols, got = canon(got_rel.fetchall(), got_rel.columns)
        try:
            want_rel = con.query(sql)
            want_cols, want = canon(want_rel.fetchall(), want_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: cols {got_cols} != {want_cols}")
            n_fail += 1
        elif got != want:
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            diffs = [(g, w) for g, w in zip(got, want) if g != w]
            for g, w in diffs[:3]:
                print(f"   got  {g}\n   want {w}")
            if len(got) == len(want):
                print(f"   ({len(diffs)} differing rows)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
