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
