#!/usr/bin/env python3
"""Per-query and per-family scaling ratios between two bench runs.

Usage: python3 tools/scale_ratio.py BENCH_SF01.json BENCH_SF1.json [factor] [watch]

`factor` is the data-size ratio between the runs (default 10). Queries
scaling worse than `1.2 * factor` are flagged SUPER-LINEAR; queries with
a sub-0.2s small-run median are reported but not flagged (fixed per-query
session overhead dominates them and the ratio is mostly noise).

`watch` is an optional comma-separated list of query names to always
print, with their fitted per-query exponent log(ratio)/log(factor) —
for pinning a specific scale-watch query (e.g. dd_cosine_neardup's
block-key cardinality fix) regardless of whether it makes the top-15.
"""
import json
import math
import sys
from collections import defaultdict


def family(name: str) -> str:
    return name.split("_", 1)[0]


def main() -> int:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    sq, bq = small["queries"], big["queries"]
    common = sorted(set(sq) & set(bq))
    failed = set(small.get("failed", [])) | set(big.get("failed", []))
    flagged, rows = [], []
    fam = defaultdict(lambda: [0.0, 0.0])
    for name in common:
        if name in failed:
            continue
        s, b = sq[name], bq[name]
        ratio = b / s if s > 0 else float("inf")
        rows.append((ratio, name, s, b))
        fam[family(name)][0] += s
        fam[family(name)][1] += b
        if ratio > 1.2 * factor and s >= 0.2:
            flagged.append((ratio, name, s, b))
    print(f"common={len(common)} failed={sorted(failed)}")
    print(f"\nper-family totals (sf-small sec -> sf-big sec, ratio):")
    for f in sorted(fam, key=lambda f: -fam[f][1]):
        s, b = fam[f]
        print(f"  {f:10s} {s:8.2f} -> {b:8.2f}  {b / s:6.2f}x")
    ts, tb = sum(r[2] for r in rows), sum(r[3] for r in rows)
    print(f"  {'TOTAL':10s} {ts:8.2f} -> {tb:8.2f}  {tb / ts:6.2f}x")
    print(f"\ntop-15 per-query ratios:")
    for ratio, name, s, b in sorted(rows, reverse=True)[:15]:
        mark = " SUPER-LINEAR" if (ratio, name, s, b) in flagged else ""
        noise = " (sub-0.2s base: overhead-dominated)" if s < 0.2 else ""
        print(f"  {name:28s} {s:7.3f} -> {b:8.3f}  {ratio:6.2f}x{mark}{noise}")
    if flagged:
        print(f"\nSUPER-LINEAR ({len(flagged)} > {1.2 * factor:.0f}x):")
        for ratio, name, s, b in sorted(flagged, reverse=True):
            print(f"  {name}: {s:.3f}s -> {b:.3f}s ({ratio:.1f}x)")
    watch = [w for w in (sys.argv[4].split(",") if len(sys.argv) > 4 else [])
             if w]
    if watch:
        print("\nwatched queries (fitted exponent = log(ratio)/log(factor)):")
        for name in watch:
            if name not in sq or name not in bq:
                print(f"  {name}: missing from one run")
                continue
            s, b = sq[name], bq[name]
            ratio = b / s if s > 0 else float("inf")
            exp = math.log(ratio) / math.log(factor) if ratio > 0 else 0.0
            note = " (sub-0.2s base: overhead-dominated)" if s < 0.2 else ""
            print(f"  {name:28s} {s:7.3f} -> {b:8.3f}  {ratio:6.2f}x  "
                  f"exp={exp:5.2f}{note}")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
