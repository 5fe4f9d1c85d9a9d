#!/usr/bin/env python3
"""Refresh the committed BenchGate baseline from a full Bench run:
copies bench_last.json's per-key `medians` into
tools/bench_baseline.json. Run after a DELIBERATE perf change and
commit the result together with the change that moved the numbers.

Usage: distill_baseline.py [bench_last.json] [tools/bench_baseline.json]
"""
import json, sys

src = sys.argv[1] if len(sys.argv) > 1 else "bench_last.json"
dst = sys.argv[2] if len(sys.argv) > 2 else "tools/bench_baseline.json"
d = json.load(open(src))
good = {k: v for k, v in (d.get("medians") or {}).items() if v is not None}
assert good, f"no medians in {src}"
json.dump(dict(sorted(good.items())), open(dst, "w"), indent=0)
print(f"{dst}: {len(good)} keys from {src} (sf={d.get('sf')})")
