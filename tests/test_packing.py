"""Sequence packing semantics on hand-built corpora: budget respected,
oversized docs isolated, determinism under repartitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from distributed_computing_projects_spark.operators.packing import (
    pack_documents,
    pack_stats,
)


def _corpus(spark, token_counts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["w"] * n)) for i, n in
         enumerate(token_counts)]
    )


def test_greedy_packs_respect_budget(spark):
    # one shard so the sequence is 10,10,10,10 -> packs [0,0,0],[1]
    df = _corpus(spark, [10, 10, 10, 10])
    out = {r.id: r.pack_id for r in
           pack_documents(df, "doc_id", "text", budget=30, n_shards=1).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 1}


def test_oversized_doc_gets_own_pack(spark):
    # 5, 100(>budget), 5: the giant must sit alone, never split/dropped
    df = _corpus(spark, [5, 100, 5])
    rows = pack_documents(df, "doc_id", "text", budget=20, n_shards=1).collect()
    packs = {r.id: r.pack_id for r in rows}
    assert packs[0] != packs[1] and packs[1] != packs[2]
    assert sorted(r.n_tokens for r in rows) == [5, 5, 100]


def test_every_doc_packed_exactly_once(spark, sf_dir):
    from distributed_computing_projects_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_documents(docs, "doc_id", "text", budget=256, n_shards=8)
    assert packed.count() == docs.count()
    assert packed.select("id").distinct().count() == docs.count()


def test_packing_stable_under_repartitioning(spark, sf_dir):
    from distributed_computing_projects_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {(r.id, r.shard, r.pack_id) for r in
         pack_documents(docs, "doc_id", "text", 256, n_shards=8).collect()}
    b = {(r.id, r.shard, r.pack_id) for r in
         pack_documents(docs.repartition(17), "doc_id", "text", 256,
                        n_shards=8).collect()}
    assert a == b


def test_pack_stats_fill_rate(spark):
    df = _corpus(spark, [10, 10, 10, 10])
    packed = pack_documents(df, "doc_id", "text", budget=30, n_shards=1)
    stats = {r.pack_id: r for r in pack_stats(packed, 30).collect()}
    assert stats[0].n_docs == 3 and stats[0].pack_tokens == 30
    assert stats[0].fill_rate == 1.0
    assert stats[1].fill_rate == pytest.approx(10 / 30, abs=1e-4)


def test_shard_larger_than_arrow_batch_packs_correctly(spark):
    """A shard spanning multiple Arrow batches must still be packed as
    ONE sequence — the iterator form of applyInPandas streams a group
    in ~10k-row chunks and would reset pack state mid-shard (regression
    guard for exactly that bug)."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    saved = spark.conf.get(key, None)
    spark.conf.set(key, "3")
    try:
        df = _corpus(spark, [10] * 12)  # one shard, 4 Arrow chunks
        out = {r.id: r.pack_id for r in
               pack_documents(df, "doc_id", "text", budget=30,
                              n_shards=1).collect()}
        # greedy over the WHOLE shard: 3 docs per pack -> packs 0..3
        assert out == {i: i // 3 for i in range(12)}
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)


def test_rejects_nonpositive_budget(spark):
    df = _corpus(spark, [1])
    with pytest.raises(ValueError):
        pack_documents(df, "doc_id", "text", budget=0)
