"""Compare two bench_times.json sidecars (min-of-reps per key).

Usage: python tools/bench_diff.py BEFORE.json AFTER.json [--top N]
Prints per-key delta sorted by absolute saving, plus totals.
"""

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("before")
    ap.add_argument("after")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--min-delta", type=float, default=0.15)
    a = ap.parse_args()
    b = json.load(open(a.before))["times_sec"]
    c = json.load(open(a.after))["times_sec"]
    common = sorted(set(b) & set(c), key=lambda k: -(b[k] - c[k]))
    tb = sum(b[k] for k in common)
    tc = sum(c[k] for k in common)
    print(f"common keys: {len(common)}  before {tb:.1f}s  after {tc:.1f}s "
          f"({100 * (tb - tc) / tb:+.1f}% saved)")
    print("\n-- biggest savings --")
    shown = 0
    for k in common:
        d = b[k] - c[k]
        if d < a.min_delta or shown >= a.top:
            break
        shown += 1
        print(f"{b[k]:8.2f} -> {c[k]:6.2f}  ({-d:+.2f})  {k}")
    print("\n-- regressions > min-delta --")
    for k in sorted(common, key=lambda k: b[k] - c[k]):
        d = c[k] - b[k]
        if d < a.min_delta:
            break
        print(f"{b[k]:8.2f} -> {c[k]:6.2f}  ({d:+.2f})  {k}")


if __name__ == "__main__":
    main()
