"""Sequence packing: assign documents to fixed-token-budget packs —
engine extension (training pipelines concatenate documents into
fixed-length sequences; the packing decision is the data-engine side
of that step; the reference has no analog).

Semantics (deterministic, shard-parallel):

- every doc goes to a shard: ``hash-free doc_id % n_shards`` keeps the
  assignment reproducible and lets shards be processed independently;
- within a shard, docs are walked in ``id`` order; a GREEDY rule opens
  a new pack when adding the doc would push the running token total
  over ``budget``. A doc longer than the whole budget gets a pack of
  its own (never split, never dropped — the trainer's chunker decides
  how to cut oversized docs).

Why not a window cumsum? ``floor(cumsum/budget)`` silently SPLITS the
straddling document across packs — greedy reset-on-overflow is the
semantics trainers expect, and it is inherently sequential per shard.
That makes it the textbook case for ``applyInPandas``: the sequential
scan runs vectorized per shard, shards run in parallel, and the
shuffle is one hash exchange on ``shard``. At 100 TB, n_shards scales
with the cluster (each shard's doc list must fit a task — thousands of
shards, not 8); packing quality is unaffected because packs never
cross shards anyway.

The per-shard scan is a Python loop over a NumPy array of per-doc
token counts (the reset-on-overflow recurrence doesn't vectorize);
that bounds shard size to ~10^6 docs for a seconds-scale task — size
``n_shards`` accordingly. The token count itself is computed JVM-side
before the shuffle, so Python only ever sees (id, shard, n_tokens).

The group function takes the WHOLE shard as one pandas frame (the
non-iterator ``applyInPandas`` form) — the iterator form streams a
group in Arrow-batch chunks (default 10k rows), and a per-chunk scan
would silently reset pack state mid-shard.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from distributed_computing_projects_spark.functions.text import tokens

PACKED_SCHEMA = (
    "id bigint, shard int, pack_id bigint, n_tokens bigint"
)


def pack_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    n_shards: int = 32,
) -> DataFrame:
    """DataFrame[id, shard, pack_id, n_tokens]: greedy packing of docs
    (in id order, per shard) into packs of at most ``budget`` whitespace
    tokens; ``pack_id`` numbers packs from 0 within each shard."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", ignore_index=True)
        ns = pdf["n_tokens"].to_numpy()
        pack_ids = []
        # "pack is non-empty" must be a member COUNT, not acc truthiness:
        # a zero-token doc opens a pack with acc == 0, and an over-budget
        # doc must still start a fresh pack after it (the docstring's
        # "a doc longer than the budget gets a pack of its own").
        pack, acc, in_pack = 0, 0, 0
        for n in ns:
            if in_pack and acc + n > budget:
                pack += 1
                acc, in_pack = 0, 0
            acc += n
            in_pack += 1
            pack_ids.append(pack)
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "shard": pdf["shard"],
                "pack_id": pd.Series(pack_ids, dtype="int64"),
                "n_tokens": pdf["n_tokens"],
            }
        )

    counted = df.select(
        F.col(id_col).alias("id"),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        # NULL text must count as 0 tokens, not NULL/-1 (size() of a null
        # array is -1 under legacy sizeOfNull, NULL otherwise — either
        # would silently perturb the greedy sums and diverge from the
        # oracle's len() = NULL).
        F.expr(
            f"greatest(coalesce(size({tokens(text_col, 'spark')}), 0), 0)"
        )
        .cast("bigint")
        .alias("n_tokens"),
    )
    return counted.groupBy("shard").applyInPandas(_pack, PACKED_SCHEMA)


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Fill-rate accounting per (shard, pack): how close packs run to
    budget — the number a pipeline actually monitors (wasted tokens =
    wasted accelerator time downstream)."""
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
        .withColumn(
            "fill_rate",
            # raw IEEE division, deliberately NOT rounded: a correctly-
            # rounded double divide is bit-identical across engines,
            # while round(x, 4) ties (pack_tokens = 8 mod 16 at
            # budget 256) split HALF_UP (Spark) vs HALF_EVEN (DuckDB)
            F.least(F.col("pack_tokens"), F.lit(budget))
            / F.lit(float(budget)),
        )
    )
