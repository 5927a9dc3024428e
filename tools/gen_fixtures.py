"""Deterministic fixture generator for the reference-parity driver
queries (FIXTURES.md §1/§4). Outputs are CHECKED IN — re-running this
script must reproduce them byte-for-byte (fixed seeds, no wall clock).

- fixtures/logs/machine.{1..5}.log — grep-provenance input mirroring
  mp3/src/machine.log.txt (format of mp3/src/logs.go:40-56). Each line
  carries a strictly-increasing per-machine timestamp so the DuckDB
  oracle can reconstruct line numbers from CONTENT order while the
  engine reconstructs them from PHYSICAL order (sources/text.py) — a
  genuine differential for the provenance path.
- fixtures/wine/wine_reviews.csv — 11-column winemag-shaped CSV
  (mp3/src/hadoop_wine/small.csv:1) with malformed rows of the kinds
  BOTH the per-line parser (sources/csv.py malformed='drop') and
  DuckDB `ignore_errors` reject identically: wrong field count and
  non-numeric ints. Embedded-newline records are deliberately absent —
  DuckDB's multi-line quote handling would keep what the reference
  drops; that divergence is pinned by pytest instead.

Usage: python tools/gen_fixtures.py  (from the repo root)
"""

from __future__ import annotations

import os
import random

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# --- logs --------------------------------------------------------------------

LOG_TEMPLATES = [
    "Marked member failed: {n}",
    "Finished Maple task {n}",
    "Started Juice task {n}",
    "GET /api/files/{n} 200",
    "PUT sdfs://file{n} replicated to 4 nodes",
    "Heartbeat from member {n}",
    "Rejoining ring after partition, incarnation {n}",
    "Scheduling juice partition {n} (hash)",
]
LEVELS = [("INFO", 85), ("WARN", 10), ("ERROR", 5)]


def gen_logs(n_machines: int = 5, lines_per_machine: int = 400) -> None:
    out_dir = os.path.join(REPO, "fixtures", "logs")
    os.makedirs(out_dir, exist_ok=True)
    for m in range(1, n_machines + 1):
        rng = random.Random(1000 + m)
        t = 0  # seconds since 2020/11/29 23:00:00, strictly increasing
        rows = []
        for _ in range(lines_per_machine):
            t += rng.randint(1, 3)
            hh, rem = divmod(t, 3600)
            mm, ss = divmod(rem, 60)
            ts = f"2020/11/29 {23 + hh:02d}:{mm:02d}:{ss:02d}"
            level = rng.choices(
                [lv for lv, _ in LEVELS], weights=[w for _, w in LEVELS]
            )[0]
            msg = rng.choice(LOG_TEMPLATES).format(n=rng.randint(1, 10))
            rows.append(f"[{level}] {ts} {msg}")
        path = os.path.join(out_dir, f"machine.{m}.log")
        with open(path, "w") as f:
            f.write("\n".join(rows) + "\n")
        print(f"wrote {path} ({len(rows)} lines)")


# --- wine reviews ------------------------------------------------------------

COUNTRIES = ["US", "France", "Italy", "Spain", "Chile", "Portugal"]
VARIETIES = ["Chardonnay", "Pinot Noir", "Cabernet Sauvignon", "Riesling",
             "Merlot"]
PROVINCES = ["California", "Burgundy", "Tuscany", "Rioja", "Douro"]
REGIONS_1 = ["Napa", "Sonoma", "Chablis", "Chianti", ""]
REGIONS_2 = ["Napa Valley", "Sonoma Coast", "Central Coast", "Columbia Valley", ""]
WINERIES = ["Stone Cellars", "Chateau Lumiere", "Villa Rossa", "Bodega Sol"]
DESC_WORDS = ["succulent", "crisp", "oaky", "bright", "tannic", "ripe",
              "apple", "cherry", "citrus", "earthy", "finish", "notes",
              "palate", "aromas", "balanced", "succulent"]


def _desc(rng: random.Random) -> str:
    n = rng.randint(6, 18)
    words = [rng.choice(DESC_WORDS) for _ in range(n)]
    return " ".join(words)


def gen_wine(n_rows: int = 1500) -> None:
    out_dir = os.path.join(REPO, "fixtures", "wine")
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(42)
    lines = [",country,description,designation,points,price,province,"
             "region_1,region_2,variety,winery"]
    for i in range(n_rows):
        kind = rng.random()
        country = rng.choice(COUNTRIES)
        desc = _desc(rng)
        desig = rng.choice(["Reserve", "Estate", ""])
        points = rng.randint(80, 100)
        price = round(rng.uniform(8, 120), 1) if rng.random() > 0.1 else ""
        province = rng.choice(PROVINCES)
        r1 = rng.choice(REGIONS_1)
        r2 = rng.choice(REGIONS_2)
        variety = rng.choice(VARIETIES) if rng.random() > 0.15 else "Chardonnay"
        winery = rng.choice(WINERIES)
        if kind < 0.01:
            # malformed: missing trailing fields (encoding/csv
            # ErrFieldCount; DuckDB: column-count error)
            lines.append(f"{i},{country},{desc},{desig},{points}")
        elif kind < 0.02:
            # malformed: truncated record, 3 fields (too-MANY-field rows
            # are deliberately absent: DuckDB's reader skips the line
            # FOLLOWING an overlong record, which the per-line parser
            # keeps — an oracle-side quirk, not a semantics we encode)
            lines.append(f"{i},{country},{desc}")
        elif kind < 0.03:
            # malformed: non-numeric points (strconv/cast failure)
            lines.append(
                f"{i},{country},{desc},{desig},ninety,{price},{province},"
                f"{r1},{r2},{variety},{winery}"
            )
        else:
            # valid; ~10% carry a quoted description WITH commas (legal
            # quoting, single line — both parsers keep it)
            if rng.random() < 0.1:
                desc_out = f'"{desc}, with a long, lingering finish"'
            else:
                desc_out = desc
            lines.append(
                f"{i},{country},{desc_out},{desig},{points},{price},"
                f"{province},{r1},{r2},{variety},{winery}"
            )
    path = os.path.join(out_dir, "wine_reviews.csv")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path} ({len(lines) - 1} data rows)")


if __name__ == "__main__":
    gen_logs()
    gen_wine()
