"""Noise-aware comparison of two bench records.

Implements the BASELINE.md round-8 comparison rule mechanically: a
per-query or total delta between two BENCH_r*.json files is only
flagged as a real regression/improvement if it exceeds the larger of
the two rounds' noise floors (the frozen canary's (max-min)/min).
Records from before round 8 carry no canary; against those the tool
falls back to the conservative historical observation (same-code runs
spread ~50% on this box) unless --floor overrides it.

Usage: python tools/bench_compare.py OLD.json NEW.json [--floor PCT]
"""

from __future__ import annotations

import argparse
import json

PRE_CANARY_FLOOR_PCT = 50.0  # observed same-code spread before r8


def load(path: str) -> dict:
    """Accept both bench.py's raw one-line record and the driver's
    BENCH_r*.json wrapper (record under \"parsed\")."""
    with open(path) as f:
        d = json.load(f)
    return d["parsed"] if "parsed" in d and "queries" not in d else d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--floor", type=float, default=None,
                    help="override the noise floor (percent)")
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)

    floors = [
        d.get("noise_floor_pct") for d in (old, new)
        if d.get("noise_floor_pct") is not None
    ]
    if args.floor is not None:
        floor = args.floor
    elif floors:
        floor = max(floors) if len(floors) == 2 else max(
            floors[0], PRE_CANARY_FLOOR_PCT
        )
    else:
        floor = PRE_CANARY_FLOOR_PCT
    print(f"noise floor: {floor:.1f}% "
          f"({'canary-measured' if floors else 'pre-canary fallback'})")

    flagged = 0
    names = sorted(set(old["queries"]) | set(new["queries"]))
    for name in names:
        a, b = old["queries"].get(name), new["queries"].get(name)
        if a is None or b is None:
            print(f"  {name:40s} {'NEW' if a is None else 'REMOVED'}")
            continue
        delta_pct = 100.0 * (b - a) / a if a else float("inf")
        if abs(delta_pct) > floor:
            tag = "REGRESSION" if delta_pct > 0 else "IMPROVEMENT"
            print(f"  {name:40s} {a:7.3f} -> {b:7.3f}  "
                  f"{delta_pct:+7.1f}%  {tag}")
            flagged += 1
    ta, tb = old["value"], new["value"]
    tot_pct = 100.0 * (tb - ta) / ta
    verdict = ("WITHIN NOISE" if abs(tot_pct) <= floor else
               ("REGRESSION" if tot_pct > 0 else "IMPROVEMENT"))
    print(f"total: {ta:.3f} -> {tb:.3f}  {tot_pct:+.1f}%  {verdict}")
    print(f"{flagged} per-query deltas beyond the floor "
          f"({len(names) - flagged} within noise)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
