"""Deterministic sampling + dataset splitting for training pipelines —
engine extension (the reference has no sampling surface; SURVEY §2
extension family alongside dedup/similarity/textstats).

Everything here is CONTENT-ADDRESSED: membership is a pure function of
(salt, id), via the same dual-dialect 32-bit md5 hash the dedup
operators use (``functions/text.py:hash32``). That is the property a
100 TB pipeline needs and ``df.sample()`` cannot give:

- reproducible across runs, engines, partitionings, and retries
  (``sample`` depends on partition layout via per-partition RNG);
- a document keeps its split assignment when the corpus is re-ingested
  or incrementally extended — train/test contamination can't creep in
  through repartitioning;
- it is a plain codegen'd filter/projection: predicate-pushdown-able,
  shuffle-free, trivially parallel at any scale.

Rates are expressed in basis points out of 10_000 (0.01 % resolution)
so bucket arithmetic stays exact integer math in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from distributed_computing_projects_spark.functions.text import hash32

BUCKETS = 10_000


def _bucket_col(id_col: str, salt: str) -> Column:
    """Stable bucket in [0, BUCKETS) from (salt, id) — spark dialect."""
    expr = hash32(f"concat('{salt}-', CAST({id_col} AS STRING))", "spark")
    return F.expr(f"({expr}) % {BUCKETS}")


def bucket_sql(id_col: str, salt: str) -> str:
    """The identical bucket arithmetic in the duck dialect — used by
    query oracles so both engines hash the same bytes."""
    expr = hash32(f"concat('{salt}-', CAST({id_col} AS VARCHAR))", "duck")
    return f"(({expr}) % {BUCKETS})"


def deterministic_sample(
    df: DataFrame, id_col: str, rate_bp: int, salt: str = "sample"
) -> DataFrame:
    """Keep ~rate_bp/10000 of rows, membership decided per id.

    A filter, not a shuffle: survives predicate pushdown and costs one
    md5 per row. Different ``salt`` values draw independent samples
    from the same corpus.
    """
    if not 0 <= rate_bp <= BUCKETS:
        raise ValueError(f"rate_bp must be in [0, {BUCKETS}], got {rate_bp}")
    return df.filter(_bucket_col(id_col, salt) < rate_bp)


def split_assign(
    df: DataFrame,
    id_col: str,
    weights_bp: dict[str, int],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test...)
    by contiguous hash-bucket ranges; weights are basis points summing
    to 10000. Assignment is per-id stable: re-ingesting or appending to
    the corpus never moves an existing document between splits.
    """
    if sum(weights_bp.values()) != BUCKETS:
        raise ValueError(
            f"weights_bp must sum to {BUCKETS}, got {sum(weights_bp.values())}"
        )
    bucket = _bucket_col(id_col, salt)
    edge = 0
    expr: Column | None = None
    for name, w in weights_bp.items():
        edge += w
        expr = (
            F.when(bucket < F.lit(edge), F.lit(name))
            if expr is None
            else expr.when(bucket < F.lit(edge), F.lit(name))
        )
    return df.withColumn(out_col, expr)


def split_case_sql(
    id_col: str, weights_bp: dict[str, int], salt: str = "split"
) -> str:
    """Duck-dialect CASE expression mirroring ``split_assign``."""
    bucket = bucket_sql(id_col, salt)
    edge = 0
    arms = []
    for name, w in weights_bp.items():
        edge += w
        arms.append(f"WHEN {bucket} < {edge} THEN '{name}'")
    return "CASE " + " ".join(arms) + " END"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates_bp: dict[str, int],
    default_bp: int = 0,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    downsample English, keep all of a low-resource language). Strata
    not in ``rates_bp`` fall back to ``default_bp``. Still a pure
    filter — no shuffle, no per-group materialization.
    """
    bucket = _bucket_col(id_col, salt)
    rate: Column = F.lit(default_bp)
    for stratum, bp in rates_bp.items():
        if not 0 <= bp <= BUCKETS:
            raise ValueError(f"rate for {stratum!r} out of range: {bp}")
        rate = F.when(F.col(strata_col) == stratum, F.lit(bp)).otherwise(rate)
    return df.filter(bucket < rate)
