"""Compare two bench_times.json sidecars and list per-key movers.

Usage: python tools/bench_adjudicate.py BASELINE.json FINAL.json [pct]

Prints keys whose min-of-N moved more than ``pct`` (default 25) in
either direction, with both sidecars' per-rep walls and the
shuffle-calibration context — the adjudication input the round-close
bench discipline requires (VERDICT r11 ask #5).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        print(
            "usage: python tools/bench_adjudicate.py"
            " BASELINE.json FINAL.json [pct]",
            file=sys.stderr,
        )
        raise SystemExit(2)
    base_p, final_p = sys.argv[1], sys.argv[2]
    pct = float(sys.argv[3]) if len(sys.argv) > 3 else 25.0
    with open(base_p) as fh:
        base = json.load(fh)
    with open(final_p) as fh:
        final = json.load(fh)
    bt, ft = base["times_sec"], final["times_sec"]
    br = base.get("times_all_reps_sec", {})
    fr = final.get("times_all_reps_sec", {})
    print(
        f"shuffle_calibration: base={base.get('shuffle_calibration_sec')}"
        f" final={final.get('shuffle_calibration_sec')}"
    )
    common = sorted(set(bt) & set(ft))
    movers = []
    for k in common:
        b, f = bt[k], ft[k]
        if b <= 0:
            continue
        delta = (f - b) / b * 100.0
        if abs(delta) >= pct and abs(f - b) >= 0.25:
            movers.append((delta, k, b, f))
    movers.sort()
    for delta, k, b, f in movers:
        print(
            f"{delta:+7.1f}%  {k:42s} {b:7.2f} -> {f:7.2f}"
            f"  base_reps={[round(x, 2) for x in br.get(k, [])]}"
            f" final_reps={[round(x, 2) for x in fr.get(k, [])]}"
        )
    print(
        f"{len(movers)} movers >= {pct}% of {len(common)} common keys;"
        f" sum base={sum(bt[k] for k in common):.1f}"
        f" final={sum(ft[k] for k in common):.1f}"
    )


if __name__ == "__main__":
    main()
