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
from distributed_computing_projects_spark.operators import storemeta

KB_PARTS = 128

STORE_KIND = "minhash_bands"


def _resolve_kb(path: str, kb_parts: int | None) -> int:
    """Effective ``kb_parts`` for the store at ``path``: the sidecar's
    value by default; an explicit value raises on mismatch (a
    wrong-``kb_parts`` probe computes wrong kb values and prunes to the
    wrong directories — silently missing duplicates)."""
    return storemeta.resolve(path, STORE_KIND, {"kb_parts": kb_parts})[
        "kb_parts"
    ]


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
    (key-hash prefix, ``kb_parts`` directories). ``kb_parts`` is
    recorded in the store's ``_params`` sidecar so probes and appends
    self-configure (storemeta)."""
    rows = banded_rows(df, id_col, text_col, kb_parts)
    rows.repartition("kb").write.partitionBy("kb").mode(
        "overwrite"
    ).parquet(path)
    storemeta.write_params(path, STORE_KIND, {"kb_parts": kb_parts})


def append_bands(df: DataFrame, path: str, id_col: str, text_col: str,
                 kb_parts: int | None = None) -> None:
    """Append a batch's bands to an existing store (epochal ingest:
    after a batch clears dedup, its bands join the corpus).
    ``kb_parts`` resolves from the store's sidecar by default; an
    explicit value raises on mismatch — an epoch written with
    different bucketing would corrupt the store's pruning."""
    kb_parts = _resolve_kb(path, kb_parts)
    rows = banded_rows(df, id_col, text_col, kb_parts)
    rows.repartition("kb").write.partitionBy("kb").mode(
        "append"
    ).parquet(storemeta.data_path(path))


def _probe(spark, path: str, batch: DataFrame, threshold: float,
           prune: bool) -> DataFrame:
    """The store-side half of the probe: prune the stored bands to the
    (cached) batch's kb directories, equi-join on (band, key)."""
    # the store schema is KNOWN (it is the banded-rows shape) — supply
    # it instead of inferring: skips footer sampling at scale and keeps
    # a degenerate store readable (an all-short-doc corpus bands to
    # zero rows, whose parquet dir has no part files to infer from)
    store = spark.read.schema(batch.schema).parquet(storemeta.data_path(path))
    if prune:
        kbs = sorted(
            r.kb for r in batch.select("kb").distinct().collect()
        )
        store = store.filter(F.col("kb").isin(kbs))
    return D._incremental_join(
        batch.drop("kb"), store.drop("kb"), threshold
    )


def incremental_pairs_against_store(
    spark,
    path: str,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    kb_parts: int | None = None,
    prune: bool = True,
) -> DataFrame:
    """(new_id, corpus_id, est_jaccard >= threshold): the day-2 probe —
    band the NEW batch on the fly, prune the stored corpus bands to the
    batch's kb directories, equi-join on (band, key). Identical result
    to ``dedup.lsh_incremental_pairs`` (the store is a cache of its
    corpus-side computation; ``tests/test_bandstore.py`` pins the
    equality), at probe cost |batch| + |touched directories| instead of
    a full corpus signature pass. ``kb_parts`` resolves from the
    store's sidecar by default (explicit values raise on mismatch).

    ``prune=True`` collects the batch's DISTINCT kb values first — one
    tiny job over the (cached) batch bands, result bounded by
    ``kb_parts`` — because an explicit IN-list is what resolves to
    PartitionFilters at planning time. The batch bands are cached
    (they are read twice: kb enumeration + join) and the batch side of
    the join broadcasts under AQE when it fits, so the stored corpus
    never shuffles. The cached batch frame stays persisted for the
    life of the returned (lazy) DataFrame — one batch per call; a
    long-running loop should use :func:`probe_and_ingest`, which
    unpersists per micro-batch.
    """
    kb_parts = _resolve_kb(path, kb_parts)
    batch = banded_rows(new_df, id_col, text_col, kb_parts).persist()
    return _probe(spark, path, batch, threshold, prune)


def compact_store(spark, path: str) -> tuple[int, int]:
    """Rewrite the store distinct-on-``(id, band, key)`` and return
    ``(rows_before, rows_after)``.

    Why this exists: :func:`append_bands` and :func:`probe_and_ingest`
    are deliberately at-least-once — a ``foreachBatch`` retry or an
    epoch re-run can append a survivor's band rows twice. That is
    benign for correctness (the probe join is DISTINCT on its output),
    but the store grows monotonically and probe read cost grows with
    it. Compaction is the counterpart: an offline rewrite that
    restores the store to one row per (doc, band).

    Dedup key: ``(id, band, key)``. ``sig`` is fully determined by the
    doc's text and ``key``/``kb`` are derived from ``sig``, so
    duplicate rows under the ingest contract are byte-identical — any
    survivor of ``dropDuplicates`` carries the same signature.

    Mechanics (atomic ``__compact__`` sibling + two-rename swap,
    sidecar preserved) are the shared
    :func:`storemeta.compact_partitioned_store`; this wrapper fixes
    the band store's identity key and partition layout.
    """
    return storemeta.compact_partitioned_store(
        spark, path, STORE_KIND, "kb", ["id", "band", "key"]
    )


def probe_and_ingest(
    spark,
    path: str,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    out_dir: str,
    threshold: float = 0.5,
    prune: bool = True,
    batch_id: int | None = None,
    compact_every: int = 0,
) -> None:
    """One landing-zone micro-batch, end to end: probe the batch
    against the store, write the duplicate pairs under ``out_dir``
    (parquet), then append the SURVIVORS' bands (batch docs with no
    pair at or above ``threshold``) to the store — so the next batch is
    deduped against this batch's survivors too, not just the original
    corpus. This is the ``foreachBatch`` body of continuous-ingest
    dedup (queries/streaming_queries.py:q_streaming_dedup_ingest).

    Retry-safety (foreachBatch re-runs a failed batch): pass the
    callback's ``batch_id`` and the pairs land in
    ``out_dir/batch-<id>`` with OVERWRITE — a re-run replaces its own
    output instead of double-appending (readers glob
    ``out_dir/batch-*``). The band append stays append-mode; a retry
    can duplicate surviving band rows, which is benign — the probe
    join is DISTINCT on (new_id, corpus_id, est) — and self-pairs from
    a partially-appended previous attempt are filtered out explicitly
    (``new_id != corpus_id``; ids never pair with themselves in a
    clean run, so the filter changes nothing there). Without
    ``batch_id`` the pairs append flat to ``out_dir`` (single-shot
    batch callers).

    ``compact_every=N`` schedules :func:`compact_store` after every
    Nth batch (by ``batch_id``, so a retried batch re-compacts
    idempotently rather than drifting the cadence) — the in-loop
    counter to the at-least-once append growth, safe here because
    foreachBatch bodies run sequentially so the atomic swap cannot
    race a probe of the same stream.

    Everything persisted here is unpersisted before returning
    (try/finally), so a long-running stream holds at most one batch's
    frames — the bounded-state discipline streaming demands. The
    survivors' bands are REUSED from the already-computed batch band
    frame (no second signature pass); the append inherits the store's
    sidecar-resolved ``kb_parts`` by construction.
    """
    import os

    kb_parts = _resolve_kb(path, None)
    batch = banded_rows(new_df, id_col, text_col, kb_parts).persist()
    pairs = (
        _probe(spark, path, batch, threshold, prune)
        .filter(F.col("new_id") != F.col("corpus_id"))
        .persist()
    )
    try:
        if batch_id is None:
            pairs.write.mode("append").parquet(out_dir)
        else:
            pairs.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch-{batch_id}")
            )
        dup_ids = pairs.select(F.col("new_id").alias("id")).distinct()
        survivors = batch.join(dup_ids, "id", "left_anti")
        survivors.repartition("kb").write.partitionBy("kb").mode(
            "append"
        ).parquet(path)
    finally:
        pairs.unpersist()
        batch.unpersist()
    # scheduled maintenance: foreachBatch bodies run sequentially, so
    # the atomic swap can't race a concurrent probe of this stream;
    # keyed to batch_id so a RETRY of batch N re-compacts (idempotent,
    # the rewrite is distinct) instead of drifting the cadence
    if compact_every and batch_id is not None and batch_id > 0 \
            and batch_id % compact_every == 0:
        compact_store(spark, path)
