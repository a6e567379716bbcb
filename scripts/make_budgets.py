#!/usr/bin/env python3
"""Regenerate bench_budgets.json from the committed bench_full.json.

Per-query budget = max(2 * t, t + 0.5) seconds — 2x the committed
best-of-passes time, with an additive floor so sub-100ms queries don't
flake on scheduler noise. Run this whenever the bench_full.json baseline
is deliberately refreshed; Bench (full runs only) exits nonzero when a
query breaches its budget.

Usage: python3 scripts/make_budgets.py [bench_full.json] [bench_budgets.json]
"""
import json
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
dst = sys.argv[2] if len(sys.argv) > 2 else "bench_budgets.json"

with open(src) as f:
    full = json.load(f)

budgets = {
    name: round(max(2 * t, t + 0.5), 3)
    for name, t in sorted(full["queries"].items())
}
with open(dst, "w") as f:
    json.dump({"source_sf": full.get("sf"), "budgets": budgets}, f, indent=1)
    f.write("\n")
print(f"wrote {dst}: {len(budgets)} budgets from {src} (sf={full.get('sf')})")
