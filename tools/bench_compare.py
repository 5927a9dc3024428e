"""Noise-aware comparison of two bench records.

Implements the BASELINE.md comparison rule mechanically: a per-query
or total delta between two BENCH_r*.json files is only flagged as a
real regression/improvement if it exceeds the larger of the two
rounds' noise floors (the frozen canary's (max-min)/min). Records
from before round 8 carry no canary; against those the tool falls
back to the conservative historical observation (same-code runs
spread ~50% on this box) unless --floor overrides it.

Round 9 adds CANARY NORMALIZATION: the raw floor rule is safe but
coarse (a 112% floor would let a true 1.5x regression pass). When
both records carry a canary reference, each query is also reported as
a ratio to its own round's canary (x-canary column); comparing ratio
to ratio cancels host load to first order, so the normalized delta
resolves real changes well under the raw floor. Rule: a delta is a
regression if it exceeds the raw floor, OR if the normalized delta
exceeds NORM_FLOOR_PCT (canary-relative spread of same-code runs,
empirically ~25% on this box).

Round 12 changes the canary reference from MIN to MEDIAN: min of a
noisy series underestimates the denominator exactly when the box
bursts (r11's canary had a 7.9x outlier against a ~0.32 s median,
which inflated condorcet_round1's normalized delta to a spurious
+30%); the median is robust to those bursts. r12+ records carry
'canary_median' directly; for older records the tool recomputes the
median from the sibling BENCH_DETAIL_r*.json's 'canary_times', and
only as a last resort falls back to 'canary_min' (flagged in the
output, since min-vs-median mixes are biased).

Usage: python tools/bench_compare.py OLD.json NEW.json [--floor PCT]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics

PRE_CANARY_FLOOR_PCT = 50.0  # observed same-code spread before r8
NORM_FLOOR_PCT = 25.0  # canary-relative spread of same-code runs


def load(path: str) -> dict:
    """Accept both bench.py's raw one-line record and the driver's
    BENCH_r*.json wrapper (record under \"parsed\")."""
    with open(path) as f:
        d = json.load(f)
    rec = d["parsed"] if "parsed" in d and "queries" not in d else d
    if rec is None:
        raise SystemExit(
            f"{path}: parsed=null (the driver's tail capture truncated "
            "this round's bench line — the r8 failure bench.py's compact "
            "emission now prevents); compare against the raw bench line "
            "or a neighboring round instead"
        )
    return rec


def canary_ref(d: dict, path: str):
    """(value, kind) canary reference for normalization, preferring the
    burst-robust median: r12+ records carry 'canary_median'; for older
    rounds the median is recomputed from the sibling
    BENCH_DETAIL_r*.json's 'canary_times'; last resort is the r9-r11
    'canary_min' / r8 {'canary': {'min': ...}} (biased low when the
    series bursts — kind tells the caller to warn)."""
    if d.get("canary_median") is not None:
        return d["canary_median"], "median"
    detail = d.get("detail_file")
    if detail is None:
        m = re.search(r"BENCH_r(\d+)\.json$", os.path.basename(path))
        if m:
            detail = f"BENCH_DETAIL_r{m.group(1)}.json"
    if detail:
        detail_path = os.path.join(os.path.dirname(path) or ".", detail)
        try:
            with open(detail_path) as f:
                times = json.load(f).get("canary_times") or []
            if times:
                return statistics.median(times), "median(detail)"
        except (OSError, ValueError):
            pass
    if d.get("canary_min") is not None:
        return d["canary_min"], "min"
    c = d.get("canary")
    if isinstance(c, dict) and c.get("min") is not None:
        return c["min"], "min"
    return None, None


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
    (c_old, k_old) = canary_ref(old, args.old)
    (c_new, k_new) = canary_ref(new, args.new)
    normalized = bool(c_old and c_new)
    if normalized:
        print(f"canary refs: {c_old:.3f} ({k_old}) -> {c_new:.3f} "
              f"({k_new}) (normalized floor {NORM_FLOOR_PCT:.0f}%)")
        if "min" in (k_old, k_new):
            print("  WARNING: min-based reference on one side — "
                  "normalized deltas biased when that round's canary "
                  "series burst; trust the raw floor rule first")
    else:
        print("canary missing in one record: raw floor rule only")

    flagged = 0
    names = sorted(set(old["queries"]) | set(new["queries"]))
    for name in names:
        a, b = old["queries"].get(name), new["queries"].get(name)
        if a is None or b is None:
            print(f"  {name:40s} {'NEW' if a is None else 'REMOVED'}")
            continue
        delta_pct = 100.0 * (b - a) / a if a else float("inf")
        line = f"  {name:40s} {a:7.3f} -> {b:7.3f}  {delta_pct:+7.1f}%"
        norm_pct = None
        if normalized and a:
            ra, rb = a / c_old, b / c_new
            norm_pct = 100.0 * (rb - ra) / ra
            line += f"  x-canary {ra:6.2f} -> {rb:6.2f} ({norm_pct:+6.1f}%)"
        raw_hit = abs(delta_pct) > floor
        norm_hit = norm_pct is not None and abs(norm_pct) > NORM_FLOOR_PCT
        if raw_hit or norm_hit:
            tag = "REGRESSION" if delta_pct > 0 else "IMPROVEMENT"
            if not raw_hit:
                tag += " (normalized only)"
            print(f"{line}  {tag}")
            flagged += 1
    ta, tb = old["value"], new["value"]
    tot_pct = 100.0 * (tb - ta) / ta
    tot_norm = None
    if normalized:
        tot_norm = 100.0 * ((tb / c_new) - (ta / c_old)) / (ta / c_old)
    hit = abs(tot_pct) > floor or (
        tot_norm is not None and abs(tot_norm) > NORM_FLOOR_PCT
    )
    verdict = ("REGRESSION" if tot_pct > 0 else "IMPROVEMENT") if hit \
        else "WITHIN NOISE"
    norm_txt = f"  normalized {tot_norm:+.1f}%" if tot_norm is not None else ""
    print(f"total: {ta:.3f} -> {tb:.3f}  {tot_pct:+.1f}%{norm_txt}  {verdict}")
    print(f"{flagged} per-query deltas beyond the floors "
          f"({len(names) - flagged} within noise)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
