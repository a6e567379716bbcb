#!/usr/bin/env python3
"""Regenerate bench_budgets.json from the committed bench_full.json.

Per-query budget = max(3 * t, t + 1.5) seconds, plus a total-level
budget of 1.75 * baseline total. Calibration: on this (shared) box,
ambient multi-tenant contention was measured to inflate sub-2s queries
up to ~3x and full-run totals up to ~1.55x on identical code, while
real plan regressions (a lost broadcast, a cartesian product, a silent
codegen-cache eviction) show up as 5-10x on the affected query. The
gate is sized to catch the latter and never flake on the former.

Run this whenever the bench_full.json baseline is deliberately
refreshed (from a WARM, full, multi-pass run); Bench (full multi-pass
runs only) exits nonzero when a query or the total breaches.

Usage: python3 scripts/make_budgets.py [bench_full.json] [bench_budgets.json]
"""
import json
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
dst = sys.argv[2] if len(sys.argv) > 2 else "bench_budgets.json"

with open(src) as f:
    full = json.load(f)

budgets = {
    name: round(max(3 * t, t + 1.5), 3)
    for name, t in sorted(full["queries"].items())
}
out = {
    "source_sf": full.get("sf"),
    "total_budget": round(1.75 * full["value"], 1),
    "budgets": budgets,
}
with open(dst, "w") as f:
    json.dump(out, f, indent=1)
    f.write("\n")
print(f"wrote {dst}: {len(budgets)} budgets, total_budget={out['total_budget']}s "
      f"from {src} (sf={full.get('sf')})")
