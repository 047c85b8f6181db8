#!/usr/bin/env python3
"""Full-surface growth gate over the ScalingBench sweep (VERDICT r06 #5).

Parses a `graft.tools.ScalingBench` log run over ALL queries (env
SPARK_GRAFT_SCALING_QUERIES=ALL) with the sf1 fixture present, and flags
every query whose last-decade growth (sf1 / sf0.1) exceeds the
threshold — the signal that a plan's shuffle or pair fan-out is growing
super-linearly with data, which absolute-time gates cannot see.

    flag if growth > GROWTH_LIMIT (default 6.0)
            and sf1_sec > 1.0      (absolute floor: sub-second queries
                                    are dominated by fixed planning
                                    cost, growth there is noise)

The data itself grows 10x per decade, so 6x is a sub-linear bar with
headroom for fixture density quirks (q125's anchor volume legitimately
grows ~5x; DuckDB's identical SQL grows 8x on the same fixture).

Usage: scaling_gate.py <scalingbench.log> [growth_limit]
Writes SCALING_gate.json ({rows, flags, verdict}) and exits 1 on flags.
"""
import json
import re
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_all.log"
    limit = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
    rows = []
    with open(path) as f:
        for line in f:
            m = re.search(
                r"(q\d+_\w+)\s+((?:\d+\.\d+\s+)+)\s*(\d+\.\d+)x", line)
            if m:
                times = [float(x) for x in m.group(2).split()]
                rows.append({"query": m.group(1), "times": times,
                             "growth": float(m.group(3))})
    if not rows:
        print(f"{path}: no ScalingBench rows found", file=sys.stderr)
        sys.exit(2)
    flags = [r for r in rows
             if r["growth"] > limit and r["times"][-1] > 1.0]
    out = {
        "source": path,
        "growth_limit": limit,
        "queries": len(rows),
        "flags": [{"query": r["query"], "growth": r["growth"],
                   "sf1_sec": r["times"][-1]} for r in flags],
        "worst": sorted(
            [{"query": r["query"], "growth": r["growth"],
              "sf1_sec": r["times"][-1]} for r in rows],
            key=lambda r: -r["growth"])[:10],
        "verdict": "FAIL" if flags else "PASS",
    }
    with open("SCALING_gate.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("queries", "growth_limit", "flags", "verdict")}))
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
