#!/usr/bin/env python
"""Compare a scale-run bench JSON against the sf0.1 baseline and print
the per-query scaling table for SCALE.md: time ratio vs the data
multiplier, flagging anything super-linear beyond the given slack.

Usage: python tools/scale_report.py BENCH_r_small.json bench_sf1.json \
           [--mult 10] [--slack 1.5]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("small")
    ap.add_argument("big")
    ap.add_argument("--mult", type=float, default=10.0)
    ap.add_argument("--slack", type=float, default=1.5)
    args = ap.parse_args()
    small = json.load(open(args.small))["queries"]
    big = json.load(open(args.big))["queries"]
    print(f"| query | sf0.1 s | sf1 s | ratio | vs {args.mult:.0f}x |")
    print("|---|---|---|---|---|")
    flagged = []
    for name, t_big in sorted(big.items(), key=lambda kv: -kv[1]):
        t_small = small.get(name)
        if t_small is None:
            continue
        ratio = t_big / t_small if t_small else float("inf")
        verdict = "ok"
        if ratio > args.mult * args.slack:
            verdict = "SUPRA-LINEAR"
            flagged.append((name, ratio))
        elif ratio <= args.mult:
            verdict = "sub-linear"
        print(f"| {name} | {t_small:.2f} | {t_big:.2f} | "
              f"{ratio:.1f}x | {verdict} |")
    common = [k for k in big if k in small]
    tot_s = sum(small[k] for k in common)
    tot_b = sum(big[k] for k in common)
    print(f"\ntotals: sf0.1 {tot_s:.1f}s -> sf1 {tot_b:.1f}s "
          f"({tot_b / tot_s:.1f}x on {args.mult:.0f}x data)")
    if flagged:
        print("flagged:", ", ".join(f"{n} ({r:.1f}x)" for n, r in flagged))


if __name__ == "__main__":
    main()
