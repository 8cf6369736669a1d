#!/usr/bin/env python3
"""Fold per-query MINIMA across clean post-swap bench artifacts into
a floors file (bench_runs/bench_min_r8.json) — the engine-consistent
baseline round-8+ deltas compare against (VERDICT r7 #7). Pre-swap
floors (bench_min_r7v3.json) are frozen history: the Spark runtime
under /opt/spark/jars moved to 4.1.2 mid-round-7, so only post-swap
artifacts are comparable (SURVEY §6).

Usage: python3 tools/fold_floors.py OUT ARTIFACT [ARTIFACT...]
Each artifact is a Bench JSON line file; contaminated artifacts are
refused. Warm blocks fold separately (numeric entries only).
"""
import json
import sys


def main():
    out, paths = sys.argv[1], sys.argv[2:]
    queries, warm, used = {}, {}, []
    for p in paths:
        d = json.loads(open(p).read().strip().splitlines()[-1])
        if d.get("contaminated"):
            print(f"refusing contaminated artifact {p}", file=sys.stderr)
            sys.exit(1)
        used.append(p)
        for k, v in d.get("queries", {}).items():
            queries[k] = min(queries.get(k, v), v)
        for k, v in d.get("warm", {}).items():
            if isinstance(v, (int, float)):
                warm[k] = min(warm.get(k, v), v)
    doc = {
        "metric": "floor_seconds_per_query_post_swap",
        "engine": "spark-4.1.2",
        "sf": "/root/testdata/sf0.1",
        "sources": used,
        "queries": dict(sorted(queries.items())),
        "warm": dict(sorted(warm.items())),
        "total_of_mins": round(sum(queries.values()), 3),
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"{out}: {len(queries)} queries, total-of-mins "
          f"{doc['total_of_mins']}s from {len(used)} artifacts")


if __name__ == "__main__":
    main()
