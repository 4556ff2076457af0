#!/usr/bin/env python3
"""Least-squares scaling exponents across the whole bench ladder.

Usage: python3 tools/scale_fit.py BENCH.json:factor [BENCH.json:factor ...]
e.g.   python3 tools/scale_fit.py BENCH_LOCAL.json:1 BENCH_SF1.json:10 \
           BENCH_SF3.json:30 BENCH_SF10.json:100

Fits time = c * (data)^e per family and per query by ordinary least
squares on log(time) vs log(factor) over ALL given points (vs
scale_ratio.py's single-segment ratio). More points damp the shared-host
noise a two-point ratio inherits. Per-query exponents are only printed
for queries >= 0.5s at the largest point (below that, fixed per-query
session overhead dominates and the fit is meaningless).

The fit is evidence, not a gate: an exponent <= ~1.0 on fixed cores
means no hidden super-linear term past the overhead floor; between 1.0
and the worst expected segment slope, read the per-query list and the
SCALE.md triage before concluding anything (in-battery artifacts
routinely push one point 2x off the line on this shared host).
"""
import json
import math
import sys
from collections import defaultdict

FAMILY_ALIAS = {"qa": "an", "ts": "an"}
CORE = {"dd", "ta", "sim", "an", "st", "etl", "mm"}


def family(name: str) -> str:
    f = name.split("_", 1)[0]
    f = FAMILY_ALIAS.get(f, f)
    return f if f in CORE else "other"


def ols_exponent(points):
    """Slope of log(t) on log(f) — points: [(factor, seconds)]."""
    xs = [math.log(f) for f, _ in points]
    ys = [math.log(t) for _, t in points if t > 0]
    if len(ys) != len(xs) or len(xs) < 2:
        return None
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    if sxx == 0:
        return None
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sxx


def main() -> int:
    runs = []
    for arg in sys.argv[1:]:
        path, _, fac = arg.rpartition(":")
        runs.append((float(fac), json.load(open(path))))
    runs.sort()
    if len(runs) < 2:
        print("need at least two file:factor points", file=sys.stderr)
        return 2
    factors = [f for f, _ in runs]
    # A ladder point may be a SUBSET battery (Bench's name-filter arg —
    # the sf100 point runs ~2h of representative queries, not 210×2
    # executions). Per-query fits therefore use every point where the
    # query was measured; family/TOTAL rows stay on the all-points
    # intersection so their sums compare like with like, and the header
    # says how many queries each run measured.
    common = set(runs[0][1]["queries"])
    union = set()
    failed = set()
    for _, d in runs:
        common &= set(d["queries"])
        union |= set(d["queries"])
        failed |= set(d.get("failed", []))
    common -= failed
    union -= failed
    fam_pts = defaultdict(lambda: defaultdict(float))
    q_pts = defaultdict(list)
    for f, d in runs:
        for name, t in d["queries"].items():
            if name in failed:
                continue
            q_pts[name].append((f, t))
            if name in common:
                fam_pts[family(name)][f] += t
    sizes = " ".join(f"{len(d['queries'])}@{f:.0f}x" for f, d in runs)
    print(f"points={factors} common={len(common)} union={len(union)} "
          f"({sizes}) failed={sorted(failed)}\n")
    print(f"{'family':10s} " +
          " ".join(f"{f:>8.0f}x" for f in factors) + "   exponent"
          f"   (family sums over the {len(common)}-query intersection)")
    total = defaultdict(float)
    for fam in sorted(fam_pts, key=lambda g: -fam_pts[g][factors[-1]]):
        pts = sorted(fam_pts[fam].items())
        e = ols_exponent(pts)
        print(f"{fam:10s} " +
              " ".join(f"{t:9.1f}" for _, t in pts) +
              f"   {e:8.2f}")
        for f, t in pts:
            total[f] += t
    tpts = sorted(total.items())
    print(f"{'TOTAL':10s} " +
          " ".join(f"{t:9.1f}" for _, t in tpts) +
          f"   {ols_exponent(tpts):8.2f}")
    fmax = {n: sorted(q_pts[n])[-1] for n in union if len(q_pts[n]) >= 2}
    big_enough = [n for n in fmax if fmax[n][1] >= 0.5]
    fitted = sorted(((ols_exponent(sorted(q_pts[n])), n) for n in big_enough),
                    reverse=True)
    print(f"\ntop-15 per-query exponents (>=0.5s at the query's own "
          f"largest point; fit over each query's measured points):")
    for e, n in fitted[:15]:
        ts = " ".join(f"{t:8.2f}@{f:.0f}" for f, t in sorted(q_pts[n]))
        print(f"  {n:28s} {ts}   e={e:5.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
