"""Approximate-nearest-neighbor search over an embedding column.

Two tiers (SURVEY.md §7.1 M6 / BASELINE.json scale extensions):

- ``brute_force_topk``: exact cosine top-k. One scan, JVM-side
  ``zip_with``/``aggregate`` math, ``TakeOrderedAndProject`` for the
  top-k (no global sort). The right baseline at any scale where a full
  scan is acceptable, and the recall oracle for the bucketed tier.
- ``lsh_topk``: sign-bit hyperplane LSH (8 fixed planes -> 256
  buckets). The query's bucket prunes the scan to ~1/256 of the data
  at the cost of recall; multi-probe = widen ``probe_hamming``.

At 100 TB the bucketed variant is the difference between scanning
everything and scanning one partition-pruned slice: write the table
partitioned by ``bucket`` and the filter becomes partition pruning.

Dot products fold left-to-right in double in both engines (verified
bit-identical on the driver data), so cosine scores — and therefore
the top-k ranking — are oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from distributed_computing_projects_spark.functions import text as T


def _query_literal(query_vec: list[float], dialect: str) -> str:
    return T._float_array_literal([float(x) for x in query_vec], dialect)


def similarity_scores(
    emb: DataFrame, query_vec: list[float], id_col: str, vec_col: str
) -> DataFrame:
    """(id, cosine) against a fixed query vector."""
    q = _query_literal(query_vec, "spark")
    d = T.dot(vec_col, q, "spark")
    cos = T.cosine(d, T.sq_norm(vec_col, "spark"), T.sq_norm(q, "spark"))
    return emb.select(F.col(id_col).alias("id"), F.expr(cos).alias("cosine"))


def brute_force_topk(
    emb: DataFrame, query_vec: list[float], k: int, id_col: str, vec_col: str
) -> DataFrame:
    """Exact top-k by cosine; ties broken by id for determinism."""
    return (
        similarity_scores(emb, query_vec, id_col, vec_col)
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def query_bucket(query_vec: list[float]) -> int:
    """Driver-side bucket of the query vector (same sign-bit formula as
    the column expression; plain Python floats are IEEE doubles)."""
    bucket = 0
    for p in range(T.N_PLANES):
        d = sum(float(x) * c for x, c in zip(query_vec, T.HYPERPLANES[p]))
        if d >= 0:
            bucket += 1 << p
    return bucket


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str,
    vec_col: str,
    probe_hamming: int = 0,
) -> DataFrame:
    """Top-k within LSH buckets whose sign pattern is within
    ``probe_hamming`` bits of the query's bucket (0 = single probe)."""
    qb = query_bucket(query_vec)
    scored = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.expr(T.lsh_bucket(vec_col, "spark")).alias("bucket"),
    )
    pruned = scored.filter(
        F.expr(T.hamming("bucket", str(qb), "spark")) <= probe_hamming
    )
    q = _query_literal(query_vec, "spark")
    cos = T.cosine(T.dot("v", q, "spark"), T.sq_norm("v", "spark"),
                   T.sq_norm(q, "spark"))
    return (
        pruned.select("id", F.expr(cos).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )
