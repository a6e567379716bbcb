#!/usr/bin/env python3
"""Cross-round bench trend: totals per round plus common-query ratios
between the two newest rounds — the one-glance drift check the judge
asked for (VERDICT r13 item 9) so a skipped-artifact round (r12) or a
slow creep can't hide between rounds.

Usage: python3 scripts/bench_trend.py [repo_root]
Reads every BENCH_r*.json (driver shape: {"n","rc","sf","parsed":{...}}
or the raw Bench stdout shape {"metric",...}) and prints:
  - per-round: total sec, query count, sf, rc
  - newest vs previous common-query ratio spread (p10/median/p90, worst 5)
"""
import json
import glob
import os
import re
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    # driver wrapper vs raw bench line
    inner = d.get("parsed", d)
    if not isinstance(inner, dict) or "queries" not in inner:
        return None
    return {
        "round": int(d.get("n", re.search(r"r(\d+)", path).group(1))),
        "rc": d.get("rc"),
        "sf": inner.get("sf", d.get("sf")),
        "total": float(inner.get("value", 0)),
        "nq": inner.get("nq", len(inner.get("queries", {}))),
        "queries": {k: float(v) for k, v in inner.get("queries", {}).items()},
    }


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    rounds = []
    for p in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        try:
            r = load(p)
        except Exception as e:  # unparseable artifact: surface, don't die
            print(f"  !! {os.path.basename(p)}: {e}")
            continue
        if r:
            rounds.append(r)
    rounds.sort(key=lambda r: r["round"])
    if not rounds:
        print("no BENCH_r*.json artifacts found")
        return 1

    print(f"{'round':>5} {'rc':>3} {'sf':>18} {'nq':>4} {'total_sec':>10}")
    prev_n = None
    for r in rounds:
        gap = "  << round gap" if prev_n is not None and r["round"] != prev_n + 1 else ""
        print(f"{r['round']:>5} {str(r['rc']):>3} {str(r['sf']):>18} "
              f"{r['nq']:>4} {r['total']:>10.1f}{gap}")
        prev_n = r["round"]

    if len(rounds) >= 2:
        new, old = rounds[-1], rounds[-2]
        common = sorted(set(new["queries"]) & set(old["queries"]))
        ratios = sorted(
            ((new["queries"][q] / old["queries"][q], q)
             for q in common if old["queries"][q] > 0),
        )
        if ratios:
            n = len(ratios)
            med = ratios[n // 2][0]
            p10 = ratios[max(0, int(n * 0.1))][0]
            p90 = ratios[min(n - 1, int(n * 0.9))][0]
            print(f"\nr{new['round']} vs r{old['round']}: {n} common reported "
                  f"queries, ratio p10={p10:.2f} median={med:.2f} p90={p90:.2f}")
            worst = [r for r in ratios if r[0] > 1.5][-5:]
            for ratio, q in reversed(worst):
                print(f"  {q}: {old['queries'][q]:.2f}s -> "
                      f"{new['queries'][q]:.2f}s ({ratio:.2f}x)")
            if not worst:
                print("  no common query regressed past 1.5x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
