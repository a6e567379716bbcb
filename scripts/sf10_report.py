#!/usr/bin/env python3
"""Assemble BENCH_sf10_subset.json — the SECOND decade of scale
evidence (r15 judge item 2): the ~40 scale-critical queries run at
sf10 (10M events / 500k docs / 200k embeddings, 100x sf0.1), compared
per-query against their sf1 wall from the committed full-registry sf1
probe. A query is flagged when sf10 wall > RATIO_BAR x its sf1 wall
(10x data between the two probes; the bar matches sf1_report.py's).

Inputs: bench_dev.json (the 1-pass sf10 subset run),
BENCH_sf1_full.json (the committed sf1 probe), and the sf10 oracle
sweep output from scripts/check.py.

Usage: python3 scripts/sf10_report.py <check_output.txt> [out.json]
"""
import json
import re
import sys

RATIO_BAR = 12.0
HEAP_BUDGET = 512 * 1024 * 1024

check_file = sys.argv[1]
out = sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf10_subset.json"

dev = json.load(open("bench_dev.json"))
sf1 = json.load(open("BENCH_sf1_full.json"))
sf1_q = sf1["queries"]

oracle = {}
for line in open(check_file):
    m = re.match(r"(PASS|FAIL) (q_\w+)", line.strip())
    if m:
        oracle[m.group(2)] = m.group(1) == "PASS"

queries = {}
flagged = []
for q, t in sorted(dev["queries"].items()):
    b = sf1_q.get(q, {}).get("sf1_sec") if isinstance(sf1_q.get(q), dict) \
        else sf1_q.get(q)
    ratio = round(t / b, 2) if b else None
    queries[q] = {
        "sf10_sec": round(t, 3),
        "sf1_sec": b,
        "ratio": ratio,
        "oracle": oracle.get(q),
    }
    if ratio is not None and ratio > RATIO_BAR:
        flagged.append(q)

watermarks = dev.get("heap_watermarks", {})
heap_breaches = sorted(s for s, b in watermarks.items() if b > HEAP_BUDGET)
jvm_peaks = [p.get("jvm_heap_peak_mb") for p in dev.get("env", {}).get("passes", [])
             if isinstance(p, dict) and p.get("jvm_heap_peak_mb") is not None]

doc = {
    "metric": "sf10_scale_probe",
    "findings": {q: "unexplained - investigate" for q in flagged},
    "heap_watermarks_bytes": watermarks,
    "heap_budget_bytes": HEAP_BUDGET,
    "heap_breaches": heap_breaches,
    "jvm_heap_peak_mb": max(jvm_peaks) if jvm_peaks else None,
    "sf": dev.get("sf"),
    "scale_vs_sf1": 10,
    "ratio_bar": RATIO_BAR,
    "total_sf10_sec": round(dev["value"], 1),
    "total_sf1_sec": round(
        sum((sf1_q[q]["sf1_sec"] if isinstance(sf1_q[q], dict) else sf1_q[q])
            for q in dev["queries"] if q in sf1_q), 1),
    "n_queries": len(queries),
    "n_oracle_pass": sum(1 for v in queries.values() if v["oracle"]),
    "n_oracle_fail": sum(1 for v in queries.values() if v["oracle"] is False),
    "n_oracle_skipped": sum(1 for v in queries.values() if v["oracle"] is None),
    "flagged_superlinear": flagged,
    "env": dev.get("env"),
    "queries": queries,
}
with open(out, "w") as f:
    json.dump(doc, f, indent=1)
    f.write("\n")
print(f"wrote {out}: {len(queries)} queries, total {doc['total_sf10_sec']}s "
      f"({doc['total_sf10_sec']/max(doc['total_sf1_sec'],0.001):.1f}x the sf1 walls at 10x data), "
      f"oracle {doc['n_oracle_pass']} pass / {doc['n_oracle_fail']} fail / "
      f"{doc['n_oracle_skipped']} unswept, flagged: {flagged or 'none'}")
if watermarks:
    mx = max(watermarks.values())
    print(f"driver collect high-water: {mx >> 20} MiB across {len(watermarks)} sites "
          f"(budget {HEAP_BUDGET >> 20} MiB); jvm heap peak "
          f"{doc['jvm_heap_peak_mb']} MB")
if heap_breaches:
    sys.exit(f"HEAP BUDGET BREACH at 100x data: {heap_breaches}")
