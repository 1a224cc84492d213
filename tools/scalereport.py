#!/usr/bin/env python3
"""Build a scale-growth artifact from two graft.Bench JSON lines.

Usage: scalereport.py <bench_small.json> <bench_large.json> <out.json> \
           [data_ratio]

Each input is the one-line artifact graft.Bench prints (per-query MIN
seconds under the "queries" key). The output records, per query, the
seconds at both scales and the large/small growth ratio, plus a summary:
queries whose growth exceeds the superlinear bar (1.5x the data ratio,
the VERDICT round-9 convention for a 10x step) and queries fast enough
at both scales (< 0.5 s) for the JVM/parquet floor to dominate the
ratio, which makes their ratios uninformative rather than alarming.
"""
import json
import sys


def main() -> None:
    small_path, large_path, out_path = sys.argv[1:4]
    data_ratio = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0
    small = json.load(open(small_path))
    large = json.load(open(large_path))
    sq, lq = small["queries"], large["queries"]
    shared = sorted(set(sq) & set(lq))
    rows = {}
    failed = []
    for name in shared:
        a, b = sq[name], lq[name]
        # Bench records a failed query as null — report it, don't crash
        if a is None or b is None:
            failed.append(name)
            continue
        rows[name] = {
            "small_sec": a,
            "large_sec": b,
            "ratio": round(b / a, 3) if a > 0 else None,
        }
    bar = 1.5 * data_ratio
    superlinear = sorted(
        n for n, r in rows.items()
        if r["ratio"] is not None and r["ratio"] > bar
        and r["large_sec"] >= 0.5)
    floor_bound = sorted(
        n for n, r in rows.items()
        if r["small_sec"] < 0.5 and r["large_sec"] < 0.5)
    ratios = sorted(r["ratio"] for r in rows.values() if r["ratio"])
    out = {
        "small_sf": small.get("sf"),
        "large_sf": large.get("sf"),
        "data_ratio": data_ratio,
        "superlinear_bar": bar,
        "n_queries": len(rows),
        "failed_either_scale": failed,
        "median_ratio": ratios[len(ratios) // 2] if ratios else None,
        "max_ratio": ratios[-1] if ratios else None,
        "superlinear": superlinear,
        "floor_bound_both_scales": floor_bound,
        "total_small_sec": round(sum(r["small_sec"] for r in rows.values()), 3),
        "total_large_sec": round(sum(r["large_sec"] for r in rows.values()), 3),
        "queries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    print(f"{len(rows)} queries; median ratio {out['median_ratio']}, "
          f"max {out['max_ratio']}; superlinear (> {bar}x and >= 0.5 s "
          f"at the large scale): {superlinear or 'none'}"
          + (f"; FAILED at either scale: {failed}" if failed else ""))


if __name__ == "__main__":
    main()
