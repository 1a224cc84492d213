#!/usr/bin/env python3
"""Build a scale-growth artifact from two graft.Bench JSON lines.

Usage: scalereport.py <bench_small.json> <bench_large.json> <out.json> \
           [data_ratio] [bytes_ratio]

Each input is the one-line artifact graft.Bench prints (per-query MIN
seconds under the "queries" key). The output records, per query, the
seconds at both scales and the large/small growth ratio, plus a summary:
queries whose growth exceeds the superlinear bar (1.5x the data ratio,
the VERDICT round-9 convention for a 10x step) and queries fast enough
at both scales (< 0.5 s) for the JVM/parquet floor to dominate the
ratio, which makes their ratios uninformative rather than alarming.

bytes_ratio (optional): the large/small growth of the TEXT corpus in
bytes (e.g. sum(length(body)) over documents at each scale). The
synthetic sf1 fixtures salt tokens per replica, which inflates bytes
beyond the row growth; a per-byte-linear pass (regex tokenizers,
subword counters) then shows a wall ratio above the row-based bar
without any algorithmic superlinearity — round 10's txt_subwords
(15.2x wall for 10x rows on ~1.2x-inflated bytes) is the motivating
case. When given, each query also gets "bytes_norm_ratio" =
ratio * data_ratio / bytes_ratio and the superlinear list uses the
NORMALIZED ratio, so byte inflation cannot trip the bar.
"""
import json
import sys


def main() -> None:
    small_path, large_path, out_path = sys.argv[1:4]
    data_ratio = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0
    bytes_ratio = float(sys.argv[5]) if len(sys.argv) > 5 else None
    small = json.load(open(small_path))
    large = json.load(open(large_path))
    sq, lq = small["queries"], large["queries"]
    shared = sorted(set(sq) & set(lq))
    rows = {}
    failed = []
    # bytes-normalization factor: how much MORE than the row ratio the
    # text bytes grew; 1.0 when bytes tracked rows exactly
    byte_inflation = (bytes_ratio / data_ratio) if bytes_ratio else 1.0
    for name in shared:
        a, b = sq[name], lq[name]
        # Bench records a failed query as null — report it, don't crash
        if a is None or b is None:
            failed.append(name)
            continue
        ratio = round(b / a, 3) if a > 0 else None
        rows[name] = {
            "small_sec": a,
            "large_sec": b,
            "ratio": ratio,
        }
        if bytes_ratio and ratio is not None:
            rows[name]["bytes_norm_ratio"] = round(ratio / byte_inflation, 3)
    bar = 1.5 * data_ratio

    def effective(r):
        return r.get("bytes_norm_ratio", r["ratio"])

    superlinear = sorted(
        n for n, r in rows.items()
        if r["ratio"] is not None and effective(r) > bar
        and r["large_sec"] >= 0.5)
    floor_bound = sorted(
        n for n, r in rows.items()
        if r["small_sec"] < 0.5 and r["large_sec"] < 0.5)
    ratios = sorted(r["ratio"] for r in rows.values() if r["ratio"])
    out = {
        "small_sf": small.get("sf"),
        "large_sf": large.get("sf"),
        "data_ratio": data_ratio,
        "bytes_ratio": bytes_ratio,
        "byte_inflation": round(byte_inflation, 3) if bytes_ratio else None,
        "superlinear_bar": bar,
        "superlinear_uses": "bytes_norm_ratio" if bytes_ratio else "ratio",
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
          f"max {out['max_ratio']}; superlinear (> {bar}x "
          f"{'bytes-normalized' if bytes_ratio else ''} and >= 0.5 s "
          f"at the large scale): {superlinear or 'none'}"
          + (f"; FAILED at either scale: {failed}" if failed else ""))


if __name__ == "__main__":
    main()
