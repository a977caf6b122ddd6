#!/usr/bin/env python3
"""Full-surface scale-ratio audit: join two Bench sidecar JSONs
(per-query converged minima at two scale factors) and rank the wall
ratios, flagging queries above a threshold.

The per-operator scale ladder (docs/GATES.md rungs) covers the heavy
arms; this audits EVERY query so an operator that was never laddered
can't hide super-linear growth. Expected flags are the documented
eval-harness arms (panel-quadratic truth joins, the ss37 fence) —
anything else above the threshold is a finding.

usage: bench_ratio.py <base.json> <scaled.json> [flag_ratio=6.0]

Both files are Bench full sidecars (SPARK_GRAFT_BENCH_OUT) with a
{"queries": {name: seconds}} map; -1 entries (failed under a fence)
are reported separately, never silently dropped.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d["queries"]


def main():
    base = load(sys.argv[1])
    scaled = load(sys.argv[2])
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 6.0
    rows, failed, missing = [], [], []
    for name, b in sorted(base.items()):
        s = scaled.get(name)
        if s is None:
            missing.append(name)
        elif s < 0 or b < 0:
            failed.append((name, b, s))
        else:
            # floor the base at 50 ms: ratios of two overhead-sized
            # walls say nothing about scaling
            rows.append((s / max(b, 0.05), name, b, s))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] >= flag]
    print(f"{len(rows)} compared, {len(flagged)} at ratio >= {flag}, "
          f"{len(failed)} failed-leg, {len(missing)} missing")
    print(f"{'query':32s} {'base_s':>7s} {'scaled_s':>8s} {'ratio':>6s}")
    for r, name, b, s in rows[:25]:
        mark = " <<<" if r >= flag else ""
        print(f"{name:32s} {b:7.2f} {s:8.2f} {r:6.1f}{mark}")
    for name, b, s in failed:
        print(f"{name:32s} {b:7.2f} FAILED(-1) — fence or error; adjudicate")
    if missing:
        print("missing from scaled lap:", ",".join(missing))
    # machine-readable tail line for gate logging
    print(json.dumps({
        "n": len(rows), "flag_ratio": flag,
        "flagged": {n: round(r, 2) for r, n, _, _ in flagged},
        "failed": [n for n, _, _ in failed],
        "median_ratio": round(sorted(r for r, *_ in rows)[len(rows) // 2], 2)
        if rows else None}))


if __name__ == "__main__":
    main()
