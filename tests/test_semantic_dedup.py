"""SemDeDup semantics: survivor rule, cell blocking, and exact-copy
capture (operators/dedup.py:semantic_dedup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_computing_projects_spark.operators import dedup as D
from distributed_computing_projects_spark.queries.ext_dedup import (
    SEMANTIC_THRESHOLD,
)

SF = "/root/testdata/sf0.001"


def test_semantic_dedup_covers_corpus_and_keeps_cell_minima(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = D.semantic_dedup(
        spark, emb, "vec_id", "embedding", threshold=SEMANTIC_THRESHOLD
    )
    rows = out.collect()
    assert len(rows) == emb.count()
    # some drops must happen on this corpus (the operator is not a no-op)
    dropped = [r for r in rows if not r["is_kept"]]
    assert dropped
    # the lowest id in every cell has no lower-id neighbor: always kept
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell_rows in by_cell.values():
        senior = min(cell_rows, key=lambda r: r["id"])
        assert senior["is_kept"], senior


def test_semantic_dedup_drops_exact_copy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # clone the seniormost vector under a fresh high id: identical
    # embedding -> same cell, cosine 1.0 -> must be dropped while the
    # original stays kept
    first = emb.orderBy("vec_id").limit(1)
    clone = first.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        "embedding",
        "label",
    )
    out = D.semantic_dedup(
        spark, emb.unionByName(clone), "vec_id", "embedding",
        threshold=SEMANTIC_THRESHOLD,
    )
    orig_id = first.collect()[0]["vec_id"]
    flags = {r["id"]: r["is_kept"] for r in out.collect()}
    assert flags[orig_id] is True
    assert flags[orig_id + 10_000_000] is False


def test_join_assignment_matches_expression_path(spark):
    from distributed_computing_projects_spark.operators import (
        ivf_train as IVT,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = IVT.seed_centroids(16)
    via_expr = {
        (r["id"], r["cell"], r["is_kept"])
        for r in D.semantic_dedup(
            spark, emb, "vec_id", "embedding",
            threshold=SEMANTIC_THRESHOLD, centroids=cents,
            assign="expr",
        ).collect()
    }
    via_join = {
        (r["id"], r["cell"], r["is_kept"])
        for r in D.semantic_dedup(
            spark, emb, "vec_id", "embedding",
            threshold=SEMANTIC_THRESHOLD, centroids=cents,
            assign="join",
        ).collect()
    }
    assert via_expr == via_join


def test_seed_centroids_extend_the_fixed_quantizer(spark):
    from distributed_computing_projects_spark.operators import (
        ivf_train as IVT,
        similarity as S,
    )

    cents = IVT.seed_centroids(40)
    assert len(cents) == 40
    # first 16 reproduce the oracle-parity fixed centroids exactly
    for c, cent in cents[:16]:
        assert cent == S.IVF_CENTROIDS[c]
