#!/usr/bin/env python3
"""Parse the heavy-tail scale-gate bench logs (tools/run pattern:
SPARK_GRAFT_BENCH_ONLY subset, REPS=1, SPARK_DRIVER_MEM=64g at
/tmp/sf1 /tmp/sf3 /tmp/sf10) into the two-decade scaling table for
DESIGN.md. Ratios are per-decade: sf1/sf0.1 comes from the committed
quiet artifact when available; sf3/sf1 (x3 data) and sf10/sf1 (x10)
from the gate logs.

Usage: python3 tools/scale_table.py /tmp/scale_sf1.log /tmp/scale_sf3.log /tmp/scale_sf10.log
"""
import json
import sys


def load(path):
    qs = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"metric":"total"' in line:
                d = json.loads(line)
                for q, v in d.get("slowest", {}).items():
                    qs[q] = v
                # slowest only holds a subset on big inventories; prefer
                # the per-query line when present
            if line.startswith("{") and '"metric":"per_query_min_med_max"' in line:
                d = json.loads(line)
                for q, v in d.get("queries", {}).items():
                    qs[q] = v[1] if isinstance(v, list) else v
    return qs


def main():
    sf1, sf3, sf10 = (load(p) for p in sys.argv[1:4])
    names = sorted(set(sf1) | set(sf3) | set(sf10))
    print("| query | sf1 | sf3 | sf10 | sf3/sf1 (3x data) | sf10/sf1 (10x data) |")
    print("|---|---|---|---|---|---|")
    for q in names:
        a, b, c = sf1.get(q), sf3.get(q), sf10.get(q)
        def fmt(x):
            return f"{x:.1f} s" if isinstance(x, float) and x > 0 else "—"
        r3 = f"{b / a:.1f}×" if a and b and a > 0 and b > 0 else "—"
        r10 = f"{c / a:.1f}×" if a and c and a > 0 and c > 0 else "—"
        print(f"| {q} | {fmt(a)} | {fmt(b)} | {fmt(c)} | {r3} | {r10} |")


if __name__ == "__main__":
    main()
