"""Candidate-count accounting: turn "would survive 100x" from a design
claim into arithmetic.

For every plane-bucketed join family, measure the EXACT candidate-pair
count (sum of C(n_b, 2) over buckets — autoplanes.measured_candidates,
no pair materialization) on the same deterministic stressed corpora the
SCALE timings use (scale_stress.build_stressed), at 1x/2x/5x/10x, next
to the uniform analytic model ``n_tables * C(N,2) / 2^n_planes``. The
measured/model ratio is the skew diagnostic: near-duplicate-heavy
corpora exceed uniform exactly by their duplicate mass (the pairs the
join exists to find). The banded MinHash family is measured the same
way per (band, key) group; no uniform model applies there (collisions
are duplicate-driven by design), so the table records measured growth.

The extrapolation block is pure arithmetic — no corpus is built:
N_f = f x the 1x count, the auto-sizer's integer rule picks
n_planes(N_f), and the model gives the candidate count and per-row
probe work. Since round 9 the 100x point is ALSO MEASURED (pass 100
in the factor list; the sandbox holds the 500k-doc / 200k-vector
corpus), so the model's 100x prediction sits next to a measured row
in the same table — the last inferential step in the scale argument
is closed and only 1000x remains extrapolated. That per-row number
staying ~target_bucket_size/2 at every N IS the scale argument, and
``tests/test_autoplanes.py`` pins measured-vs-model within tolerance
on uniform vectors so the formula is not free-floating prose.

Results land in SCALE.json under "candidates" and render into SCALE.md
by the shared writer (tools/scale_stress.py keeps the section when it
regenerates the timings).

Usage: python tools/candidate_accounting.py [factor[,factor...]]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from distributed_computing_projects_spark.operators import (  # noqa: E402
    autoplanes as AP,
    dedup as D,
)
from distributed_computing_projects_spark.session import get_spark  # noqa: E402
from tools.scale_stress import build_stressed  # noqa: E402

EXTRAPOLATE_FACTORS = [100, 1000]


def account_factor(spark, factor: int) -> dict:
    work = tempfile.mkdtemp(prefix="dcp_cand_")
    try:
        dp, ep = build_stressed(spark, factor, work)
        docs = spark.read.parquet(dp)
        emb = spark.read.parquet(ep)
        n_vecs = emb.count()
        n_docs = docs.count()

        joins = {}
        n_auto = AP.resolve_n_planes(n_vecs)
        for name, n_planes, n_tables in (
            ("knn_auto", n_auto, 1),
            ("knn_12_planes", 12, 1),
            ("knn_bandor_12x4", 12, 4),
        ):
            measured = AP.measured_candidates(
                emb, "embedding", n_planes, n_tables
            )
            model = AP.model_candidates(n_vecs, n_planes, n_tables)
            joins[name] = {
                "n_planes": n_planes,
                "n_tables": n_tables,
                "measured": measured,
                "model": model,
                "ratio": round(measured / model, 2) if model else None,
                "per_row": round(measured / n_vecs, 1),
            }
        # SemDeDup's blocking: within-cell pairs under the corpus-sized
        # quantizer (k = N/500, same sizing the SCALE timing row uses).
        # Uniform model = C(N,2)/k; per-row target ~ cell_size/2 = 250
        # at every N once k tracks N — the same pinned-per-row-work
        # argument as the knn auto-sizer, for the k-means tier.
        from distributed_computing_projects_spark.operators import (
            ivf_train as IVT,
        )

        k_cells = max(16, n_vecs // 500)
        assigned = IVT.assign_cells_join(
            emb, "vec_id", "embedding", IVT.seed_centroids(k_cells)
        )
        m_sem = AP.measured_grouped_candidates(assigned, "cell")
        model_sem = (n_vecs * (n_vecs - 1) // 2) // k_cells
        joins["semdedup_cells"] = {
            "n_cells": k_cells,
            "measured": m_sem,
            "model": model_sem,
            "ratio": round(m_sem / model_sem, 2) if model_sem else None,
            "per_row": round(m_sem / n_vecs, 1),
        }
        banded = D._banded(D.minhash_signatures(docs, "doc_id", "text"))
        m = AP.measured_grouped_candidates(banded, "band", "key")
        joins["minhash_bands"] = {
            "measured": m,
            "model": None,  # duplicate-driven by design
            "per_row": round(m / n_docs, 1),
        }
        return {"factor": factor, "n_docs": n_docs, "n_vecs": n_vecs,
                "joins": joins}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def extrapolate(n_vecs_1x: int) -> list[dict]:
    out = []
    for f in EXTRAPOLATE_FACTORS:
        n = n_vecs_1x * f
        n_planes = AP.resolve_n_planes(n)
        model = AP.model_candidates(n, n_planes)
        out.append({
            "factor": f,
            "n_vecs": n,
            "auto_n_planes": n_planes,
            "model_candidates": model,
            "per_row": round(model / n, 1),
        })
    return out


def main() -> int:
    factors = ([int(x) for x in sys.argv[1].split(",")]
               if len(sys.argv) > 1 else [1, 2, 5, 10])
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="candidate-accounting", cpus=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    runs = []
    for f in factors:
        print(f"=== factor {f}x ===")
        r = account_factor(spark, f)
        runs.append(r)
        for name, j in r["joins"].items():
            print(f"  {name:18s} measured={j['measured']:>12,}"
                  + (f"  model={j['model']:>12,}  ratio={j['ratio']}"
                     if j.get("model") else "")
                  + f"  per_row={j['per_row']}")

    candidates = {
        "protocol": "sum of C(n_b,2) over buckets per table (exact, no "
                    "pair materialization) on the scale_stress stressed "
                    "corpora; model = n_tables * C(N,2) / 2^n_planes; "
                    "see tools/candidate_accounting.py",
        "runs": runs,
        "extrapolation": extrapolate(runs[0]["n_vecs"]),
    }

    scale_path = os.path.join(REPO, "SCALE.json")
    out = json.load(open(scale_path)) if os.path.exists(scale_path) else {}
    out["candidates"] = candidates
    with open(scale_path, "w") as fh:
        json.dump(out, fh, indent=1)
    if "runs" in out:
        from tools.scale_stress import _write_md

        _write_md(out)
    print(json.dumps(candidates))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
