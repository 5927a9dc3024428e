"""Persisted band store (operators/bandstore.py): result parity with
the on-the-fly incremental path, epochal append, and prune opt-out."""

from __future__ import annotations

from pyspark.sql import Row

from distributed_computing_projects_spark.operators import bandstore as BS
from distributed_computing_projects_spark.operators import dedup as D


def _pairs(df):
    return sorted((r.new_id, r.corpus_id, round(r.est_jaccard, 9))
                  for r in df.collect())


def test_store_probe_equals_on_the_fly(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter("source <> 'src0'")
    batch = docs.filter("source = 'src0'")
    path = str(tmp_path / "bands")
    BS.write_bands(corpus, path, "doc_id", "text")
    via_store = BS.incremental_pairs_against_store(
        spark, path, batch, "doc_id", "text", threshold=0.25
    )
    direct = D.lsh_incremental_pairs(batch, corpus, "doc_id", "text",
                                     threshold=0.25)
    assert _pairs(via_store) == _pairs(direct)
    # prune is an optimization, never a semantics change
    no_prune = BS.incremental_pairs_against_store(
        spark, path, batch, "doc_id", "text", threshold=0.25, prune=False
    )
    assert _pairs(no_prune) == _pairs(direct)


def test_append_bands_epochal_ingest(spark, tmp_path):
    """After a batch clears dedup its bands append to the store; the
    next epoch's probe must see it as corpus."""
    text = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text="totally unrelated words here okay then")]
    )
    path = str(tmp_path / "bands")
    BS.write_bands(corpus, path, "doc_id", "text")
    epoch1 = spark.createDataFrame([Row(doc_id=2, text=text)])
    assert _pairs(BS.incremental_pairs_against_store(
        spark, path, epoch1, "doc_id", "text", threshold=0.5)) == []
    BS.append_bands(epoch1, path, "doc_id", "text")
    epoch2 = spark.createDataFrame([Row(doc_id=3, text=text)])
    got = _pairs(BS.incremental_pairs_against_store(
        spark, path, epoch2, "doc_id", "text", threshold=0.5))
    assert got == [(3, 2, 1.0)]


def test_compact_store_after_double_append(spark, sf_dir, tmp_path):
    """A simulated foreachBatch retry (same epoch appended twice) grows
    the store with benign-duplicate band rows; compaction must shrink
    it back to one row per (doc, band) WITHOUT changing any probe
    result, and must preserve the sidecar and partition layout."""
    import os

    from distributed_computing_projects_spark.operators import storemeta

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter("source <> 'src0'")
    batch = docs.filter("source = 'src0'")
    path = str(tmp_path / "bands")
    BS.write_bands(corpus, path, "doc_id", "text")
    # retry: the same epoch lands twice (at-least-once append contract)
    epoch = corpus.limit(20)
    BS.append_bands(epoch, path, "doc_id", "text")
    BS.append_bands(epoch, path, "doc_id", "text")

    pre = _pairs(BS.incremental_pairs_against_store(
        spark, path, batch, "doc_id", "text", threshold=0.25))
    before, after = BS.compact_store(spark, path)
    post = _pairs(BS.incremental_pairs_against_store(
        spark, path, batch, "doc_id", "text", threshold=0.25))

    assert post == pre
    # the doubled epoch's rows (and the write_bands/append overlap) are
    # gone: exactly one row per (id, band) remains
    dedup_rows = (
        spark.read.parquet(path)
        .select("id", "band").distinct().count()
    )
    assert after == dedup_rows
    assert before > after
    # sidecar survived the swap with identical parameters
    meta = storemeta.read_params(path)
    assert meta == {"kind": BS.STORE_KIND, "kb_parts": BS.KB_PARTS}
    # hive layout survived: kb=* directories, no stray temp dirs
    assert any(d.startswith("kb=") for d in os.listdir(path))
    assert not os.path.exists(path + ".__compact__")
    assert not os.path.exists(path + ".__pre_compact__")


def test_compact_store_requires_sidecar(spark, tmp_path):
    import os

    import pytest

    from distributed_computing_projects_spark.operators import storemeta

    p = str(tmp_path / "not_a_store")
    os.makedirs(p, exist_ok=True)
    with pytest.raises(storemeta.StoreParamsError):
        BS.compact_store(spark, p)


def test_probe_and_ingest_compact_every(spark, tmp_path):
    """compact_every folds store maintenance into the ingest loop: a
    retried (double-run) batch leaves duplicate band rows, and the
    next scheduled compaction removes them without changing pairs."""
    from pyspark.sql import Row

    texts = {
        1: "totally unrelated words in this document body",
        10: "alpha beta gamma delta epsilon zeta eta theta",
        20: "one two three four five six seven eight nine",
        30: "alpha beta gamma delta epsilon zeta eta theta",  # dup of 10
    }
    corpus = spark.createDataFrame([Row(doc_id=1, text=texts[1])])
    path = str(tmp_path / "bands")
    out = str(tmp_path / "pairs")
    BS.write_bands(corpus, path, "doc_id", "text")

    def ingest(doc_id, batch_id):
        df = spark.createDataFrame([Row(doc_id=doc_id, text=texts[doc_id])])
        BS.probe_and_ingest(spark, path, df, "doc_id", "text", out,
                            threshold=0.5, batch_id=batch_id,
                            compact_every=2)

    ingest(10, 0)
    ingest(10, 1)   # retry of the same docs under a new id slot:
    ingest(10, 1)   # double-run => duplicate band rows in the store
    store_rows = spark.read.parquet(path)
    assert store_rows.count() > store_rows.distinct().count()
    ingest(20, 2)   # scheduled compaction fires here (2 % 2 == 0)
    store_rows = spark.read.parquet(path)
    assert store_rows.count() == store_rows.distinct().count()
    # the store still dedups: a dup of doc 10 pairs against it
    got = _pairs(BS.incremental_pairs_against_store(
        spark, path, spark.createDataFrame(
            [Row(doc_id=30, text=texts[30])]),
        "doc_id", "text", threshold=0.5))
    assert [(p[0], p[1]) for p in got] == [(30, 10)]
