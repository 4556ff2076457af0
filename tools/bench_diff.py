#!/usr/bin/env python3
"""Diff a bench detail file against the checked-in per-query baseline.

Usage: python3 tools/bench_diff.py [BENCH_LOCAL.json [BENCH_BASELINE_PERQ.json]]

Flags, mirroring the in-bench gate (Bench.scala):
  REGRESSION  median > 1.5x baseline AND > 0.3s absolute over it
              (the absolute floor keeps sub-half-second shared-host
              noise out of the gate; r10 saw 3x movers at 0.12->0.37s
              on unchanged code)
  NEW         query present in the run but absent from the baseline
  GONE        query present in the baseline but absent from the run
  IMPROVED    informational: < 0.67x baseline and > 0.3s under it

Exit code 1 when any REGRESSION or GONE exists (NEW alone is fine —
a freshly added query simply has no baseline yet).
"""
import json
import sys


def main() -> int:
    run_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LOCAL.json"
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BASELINE_PERQ.json"
    run = json.load(open(run_path))
    base = json.load(open(base_path))
    run_q = run["queries"]
    base_q = base["queries"]

    run_sf = str(run.get("sf", ""))
    base_sf = str(base.get("sf", ""))
    if base_sf and not run_sf.endswith(base_sf):
        print(f"NOTE: run sf={run_sf!r} does not match baseline sf={base_sf!r}; "
              "ratios are cross-scale, not regressions.")

    failed = run.get("failed", [])
    if failed:
        print(f"FAILED ({len(failed)}): {', '.join(failed)}")

    regressions, improved = [], []
    for name in sorted(run_q):
        if name not in base_q or name in failed:
            continue
        t, b = run_q[name], base_q[name]
        if t > b * 1.5 and t - b > 0.3:
            regressions.append((name, b, t))
        elif t < b * 0.67 and b - t > 0.3:
            improved.append((name, b, t))

    new = sorted(set(run_q) - set(base_q))
    gone = sorted(set(base_q) - set(run_q))

    for name, b, t in regressions:
        print(f"REGRESSION  {name}: {b:.3f}s -> {t:.3f}s ({t / b:.2f}x)")
    for name in new:
        print(f"NEW         {name}: {run_q[name]:.3f}s (no baseline)")
    for name in gone:
        print(f"GONE        {name}: was {base_q[name]:.3f}s")
    for name, b, t in improved:
        print(f"IMPROVED    {name}: {b:.3f}s -> {t:.3f}s ({t / b:.2f}x)")

    common = set(run_q) & set(base_q)
    rt = sum(run_q[n] for n in common)
    bt = sum(base_q[n] for n in common)
    print(f"common set: {len(common)} queries, baseline {bt:.1f}s -> run {rt:.1f}s "
          f"({rt / bt:.2f}x)" if common else "no common queries")
    print(f"summary: {len(regressions)} regression(s), {len(new)} new, "
          f"{len(gone)} gone, {len(improved)} improved, {len(failed)} failed")
    return 1 if (regressions or gone or failed) else 0


if __name__ == "__main__":
    sys.exit(main())
