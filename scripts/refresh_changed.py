#!/usr/bin/env python3
"""Replace CHANGED queries' baseline entries with this code's numbers.

merge_baseline.py takes per-query minima across runs — correct for
unchanged plans, wrong for queries whose plan deliberately changed this
round: min(old_code, new_code) keeps a minimum the new code cannot
reach, and budgets derived from it flake forever. For each named query,
overwrite `queries` (min) and `queries_max` from the given run(s) ONLY,
then recompute the total.

Usage:
  python3 scripts/refresh_changed.py <baseline.json> <run.json[,run2.json...]> q1 q2 ...
"""
import json
import sys


def main(baseline_path, runs_arg, names):
    with open(baseline_path) as f:
        base = json.load(f)
    runs = []
    for p in runs_arg.split(","):
        with open(p) as f:
            runs.append(json.load(f))
    for r in runs:
        if r.get("failures"):
            sys.exit(f"refusing: run has failures {sorted(r['failures'])}")
    for q in names:
        vals = [r["queries"][q] for r in runs if q in r.get("queries", {})]
        # a merged input's queries_max carries contention already
        # observed on this code — fold it in or the 1.3x budget floor
        # understates known variance and the gate flakes
        maxes = vals + [r["queries_max"][q] for r in runs
                        if q in r.get("queries_max", {}) and q in r.get("queries", {})]
        if not vals:
            sys.exit(f"refusing: {q} absent from every given run")
        base["queries"][q] = round(min(vals), 3)
        base.setdefault("queries_max", {})[q] = round(max(maxes), 3)
        # a changed metered stream query: its DATA passes must come from
        # the new code's runs only, same as the wall numbers
        sd = [round(p, 3) for r in runs for p in r.get("stream_data", {}).get(q, [])]
        if sd:
            base.setdefault("stream_data", {})[q] = sorted(sd)
    base["value"] = round(sum(base["queries"].values()), 3)
    with open(baseline_path, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
    print(f"refreshed {len(names)} queries in {baseline_path}; total {base['value']}s")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
