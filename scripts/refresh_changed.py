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
import os
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
        # the new code's runs only, same as the wall numbers. If the
        # refreshed query carries NO data passes in any run (it stopped
        # being stream-metered, or the runs predate metering), drop the
        # stale old-code entry so Bench falls back to the wall gate
        # instead of silently keeping a budget the new code never hit.
        sd = [round(p, 3) for r in runs for p in r.get("stream_data", {}).get(q, [])]
        if sd:
            base.setdefault("stream_data", {})[q] = sorted(sd)
        else:
            base.get("stream_data", {}).pop(q, None)
    base["value"] = round(sum(base["queries"].values()), 3)
    with open(baseline_path, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
    print(f"refreshed {len(names)} queries in {baseline_path}; total {base['value']}s")
    # make_budgets.py min-ratchets stream DATA budgets against the
    # previous budgets file's data_budgets_observed — which would keep
    # the OLD code's faster minimum for a deliberately-changed query and
    # flake its data gate forever. Drop the refreshed names from that
    # fold so the next make_budgets run budgets them from new-code runs.
    budgets_path = os.path.join(os.path.dirname(os.path.abspath(baseline_path)),
                                "bench_budgets.json")
    if os.path.exists(budgets_path):
        with open(budgets_path) as f:
            budgets = json.load(f)
        observed = budgets.get("data_budgets_observed", {})
        popped = [q for q in names if observed.pop(q, None) is not None]
        if popped:
            with open(budgets_path, "w") as f:
                json.dump(budgets, f, indent=1)
                f.write("\n")
            print(f"dropped stale data_budgets_observed for: {','.join(popped)} "
                  f"(rerun make_budgets.py)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
