#!/usr/bin/env python3
"""Scale-up report: compare two Bench JSONs (e.g. sf0.1 vs a 10x
replica) and print a per-group markdown table of scaling factors for
BASELINE.md. A key is flagged when its wall-time ratio exceeds the
superlinear threshold (default 12x for a 10x data scale-up).

Usage: scale_report.py <bench_small.json> <bench_big.json> [threshold]
"""
import json, sys
from collections import defaultdict

def group(k: str) -> str:
    for p in ("stream_", "llm_", "mm_", "etl_", "ts_", "agg_", "join_",
              "win_", "fn_", "source_", "sink_", "scan_", "q"):
        if k.startswith(p):
            return {"source_": "io", "sink_": "io", "scan_": "io",
                    "q": "composite"}.get(p, p.rstrip("_"))
    return "relational"

def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0
    qs, qb = small["queries"], big["queries"]
    common = sorted(k for k in qs if k in qb
                    and qs[k] is not None and qb[k] is not None)
    rows = [(k, qs[k], qb[k], qb[k] / qs[k]) for k in common]
    by_group = defaultdict(list)
    for k, a, b, r in rows:
        by_group[group(k)].append((k, a, b, r))
    print(f"| group | keys | sf0.1 total (s) | 10x total (s) | "
          f"median ratio | max ratio (key) |")
    print("| --- | --- | --- | --- | --- | --- |")
    for g in sorted(by_group):
        ks = by_group[g]
        ratios = sorted(r for _, _, _, r in ks)
        med = ratios[len(ratios) // 2]
        mk, _, _, mr = max(ks, key=lambda t: t[3])
        print(f"| {g} | {len(ks)} | {sum(a for _, a, _, _ in ks):.1f} | "
              f"{sum(b for _, _, b, _ in ks):.1f} | {med:.2f}x | "
              f"{mr:.2f}x ({mk}) |")
    flagged = [(k, a, b, r) for k, a, b, r in rows if r > thresh]
    print(f"\nsuperlinear (> {thresh:.0f}x): "
          + (", ".join(f"{k} {r:.1f}x ({a:.2f}s -> {b:.2f}s)"
                       for k, a, b, r in sorted(
                           flagged, key=lambda t: -t[3]))
             if flagged else "none"))
    miss = sorted(set(qs) - set(qb)) + big.get("failed", [])
    if miss:
        print(f"missing/failed at 10x: {sorted(set(miss))}")

if __name__ == "__main__":
    main()
