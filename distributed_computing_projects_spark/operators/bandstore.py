"""Persisted MinHash band store: the at-scale half of incremental
dedup that ``dedup.lsh_incremental_pairs`` documents ("at 100 TB the
corpus signatures/bands are computed ONCE and persisted as a
(band, key) table") — here it is as a real store.

Layout: one pass over the corpus computes signatures and band keys
(same math as the on-the-fly path — ``dedup.minhash_signatures`` +
``dedup._banded``), and the rows land hive-partitioned by
``kb = pmod(xxhash64(key), kb_parts)``, a hash prefix of the band key.
Why ``kb`` and not ``band``: every document emits ALL ``N_BANDS``
bands, so a probe touches every band value and a band-partitioned
store could never prune; the key-hash prefix is what a SMALL batch
leaves mostly untouched. A probe enumerates the batch's distinct kb
values driver-side — bounded by ``kb_parts`` (a constant), never by
data — and applies them as ``kb IN (...)``, which Spark resolves as
PartitionFilters: non-probed directories are never listed into the
scan (plan-asserted in ``tests/test_plans.py``). A day-2 batch of B
docs touches at most ``B * N_BANDS`` of the ``kb_parts`` directories,
so probe read cost tracks the batch size, not the corpus size; a batch
large enough to touch every directory reads the whole store — exactly
the work its candidate join needs anyway.

Write cost: one corpus pass + one hash exchange on ``kb`` so each
directory is written by one task (one file per directory, no
tasks x partitions small-file spray). ~(150 + key) B x N_BANDS per
doc. Epochal ingest appends the accepted batch's bands with
``append_bands`` (dynamic partition overwrite is wrong here — append
is the contract), keeping the store current without rewriting it.

Reference parity note: the reference has no incremental-ingest surface
at all (its SDFS is whole-file put/get, mp3/src/sdfs.go:108-227); this
is BASELINE.json scale-extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from distributed_computing_projects_spark.operators import dedup as D

KB_PARTS = 128


def _with_kb(banded: DataFrame, kb_parts: int) -> DataFrame:
    return banded.withColumn(
        "kb", F.pmod(F.xxhash64("key"), F.lit(kb_parts)).cast("int")
    )


def banded_rows(df: DataFrame, id_col: str, text_col: str,
                kb_parts: int = KB_PARTS) -> DataFrame:
    """(id, sig, band, key, kb) for every doc — the store's row shape,
    same signature/band math as the on-the-fly dedup path."""
    return _with_kb(
        D._banded(D.minhash_signatures(df, id_col, text_col)), kb_parts
    )


def write_bands(df: DataFrame, path: str, id_col: str, text_col: str,
                kb_parts: int = KB_PARTS) -> None:
    """Materialize the corpus band table hive-partitioned by ``kb``
    (key-hash prefix, ``kb_parts`` directories)."""
    rows = banded_rows(df, id_col, text_col, kb_parts)
    rows.repartition("kb").write.partitionBy("kb").mode(
        "overwrite"
    ).parquet(path)


def append_bands(df: DataFrame, path: str, id_col: str, text_col: str,
                 kb_parts: int = KB_PARTS) -> None:
    """Append a batch's bands to an existing store (epochal ingest:
    after a batch clears dedup, its bands join the corpus)."""
    rows = banded_rows(df, id_col, text_col, kb_parts)
    rows.repartition("kb").write.partitionBy("kb").mode(
        "append"
    ).parquet(path)


def incremental_pairs_against_store(
    spark,
    path: str,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    kb_parts: int = KB_PARTS,
    prune: bool = True,
) -> DataFrame:
    """(new_id, corpus_id, est_jaccard >= threshold): the day-2 probe —
    band the NEW batch on the fly, prune the stored corpus bands to the
    batch's kb directories, equi-join on (band, key). Identical result
    to ``dedup.lsh_incremental_pairs`` (the store is a cache of its
    corpus-side computation; ``tests/test_bandstore.py`` pins the
    equality), at probe cost |batch| + |touched directories| instead of
    a full corpus signature pass.

    ``prune=True`` collects the batch's DISTINCT kb values first — one
    tiny job over the (cached) batch bands, result bounded by
    ``kb_parts`` — because an explicit IN-list is what resolves to
    PartitionFilters at planning time. The batch bands are cached
    (they are read twice: kb enumeration + join) and the batch side of
    the join broadcasts under AQE when it fits, so the stored corpus
    never shuffles.
    """
    batch = banded_rows(new_df, id_col, text_col, kb_parts).persist()
    # the store schema is KNOWN (it is the banded-rows shape) — supply
    # it instead of inferring: skips footer sampling at scale and keeps
    # a degenerate store readable (an all-short-doc corpus bands to
    # zero rows, whose parquet dir has no part files to infer from)
    store = spark.read.schema(batch.schema).parquet(path)
    if prune:
        kbs = sorted(
            r.kb for r in batch.select("kb").distinct().collect()
        )
        store = store.filter(F.col("kb").isin(kbs))
    return D._incremental_join(
        batch.drop("kb"), store.drop("kb"), threshold
    )
