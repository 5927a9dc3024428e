"""Store parameter sidecars (operators/storemeta.py): every partitioned
ANN/band store records its write parameters; probes resolve them and
RAISE on explicit mismatch instead of silently pruning to the wrong
directories — the likeliest silent-wrong-answer failure at scale
(VERDICT r6 'What's wrong' #1)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row, functions as F

from distributed_computing_projects_spark.operators import (
    autoplanes as AP,
    bandstore as BS,
    similarity as S,
    storemeta,
)

SF_DIR = "/root/testdata/sf0.001"
Q = [0.3, -0.7] + [0.01 * i for i in range(30)]


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


# ---------------------------------------------------------------- core


def test_resolve_reads_sidecar(tmp_path):
    p = str(tmp_path)
    storemeta.write_params(p, "lsh_bucketed", {"n_planes": 7})
    assert storemeta.resolve(p, "lsh_bucketed", {"n_planes": None}) == {
        "n_planes": 7
    }
    # matching explicit value passes through
    assert storemeta.resolve(p, "lsh_bucketed", {"n_planes": 7}) == {
        "n_planes": 7
    }


def test_resolve_raises_on_mismatch(tmp_path):
    p = str(tmp_path)
    storemeta.write_params(p, "lsh_bucketed", {"n_planes": 7})
    with pytest.raises(storemeta.StoreParamsError, match="n_planes=7"):
        storemeta.resolve(p, "lsh_bucketed", {"n_planes": 8})


def test_resolve_raises_on_kind_mismatch(tmp_path):
    p = str(tmp_path)
    storemeta.write_params(p, "ivf", {"centroids": [[1.0]]})
    with pytest.raises(storemeta.StoreParamsError, match="kind"):
        storemeta.resolve(p, "lsh_bucketed", {"n_planes": None})


def test_presidecar_store_needs_explicit_values(tmp_path):
    p = str(tmp_path)  # no sidecar written
    with pytest.raises(storemeta.StoreParamsError, match="no _params"):
        storemeta.resolve(p, "lsh_bucketed", {"n_planes": None})
    # explicit values remain the compatibility path
    assert storemeta.resolve(p, "lsh_bucketed", {"n_planes": 5}) == {
        "n_planes": 5
    }


def test_missing_param_in_old_sidecar_raises(tmp_path):
    p = str(tmp_path)
    storemeta.write_params(p, "lsh_tables", {"n_planes": 4})
    with pytest.raises(storemeta.StoreParamsError, match="records no"):
        storemeta.resolve(
            p, "lsh_tables", {"n_planes": None, "n_tables": None}
        )


# ------------------------------------------------------- store wiring


def test_lsh_store_self_configures(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "lsh")
    S.write_bucketed(emb, path, "vec_id", "embedding", n_planes=6)
    meta = json.load(open(os.path.join(path, "_params")))
    assert meta == {"kind": "lsh_bucketed", "n_planes": 6}
    # sidecar-resolved probe == explicit-matching probe
    auto = S.lsh_topk_bucketed(spark, path, Q, 5, probe_hamming=1)
    explicit = S.lsh_topk_bucketed(spark, path, Q, 5, probe_hamming=1,
                                   n_planes=6)
    assert [r.id for r in auto.collect()] == [
        r.id for r in explicit.collect()
    ]
    with pytest.raises(storemeta.StoreParamsError):
        S.lsh_topk_bucketed(spark, path, Q, 5, n_planes=8)


def test_lsh_auto_store_probe_needs_no_params(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "lsha")
    n = AP.write_bucketed_auto(emb, path, "vec_id", "embedding",
                               target_bucket_size=8)
    got = S.lsh_topk_bucketed(spark, path, Q, 5, probe_hamming=1)
    want = S.lsh_topk_bucketed(spark, path, Q, 5, probe_hamming=1,
                               n_planes=n)
    assert [r.id for r in got.collect()] == [r.id for r in want.collect()]


def test_tables_store_self_configures(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "tbl")
    AP.write_bucketed_tables(emb, path, "vec_id", "embedding",
                             n_planes=4, n_tables=3)
    auto = AP.lsh_topk_tables(spark, path, Q, 5)
    explicit = AP.lsh_topk_tables(spark, path, Q, 5, n_planes=4,
                                  n_tables=3)
    assert [r.id for r in auto.collect()] == [
        r.id for r in explicit.collect()
    ]
    with pytest.raises(storemeta.StoreParamsError):
        AP.lsh_topk_tables(spark, path, Q, 5, n_planes=5, n_tables=3)
    with pytest.raises(storemeta.StoreParamsError):
        AP.lsh_topk_tables(spark, path, Q, 5, n_planes=4, n_tables=2)


def test_ivf_store_carries_its_quantizer(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "ivf")
    S.write_ivf(emb, path, "vec_id", "embedding")
    meta = storemeta.read_params(path)
    assert meta["kind"] == "ivf"
    assert meta["centroids"] == S.IVF_CENTROIDS
    got = S.ivf_topk_partitioned(spark, path, Q, 5, probes=2)
    assert len(got.collect()) == 5
    # probing a non-IVF store as IVF raises
    lsh_path = str(tmp_path / "lsh2")
    S.write_bucketed(emb, lsh_path, "vec_id", "embedding", n_planes=4)
    with pytest.raises(storemeta.StoreParamsError):
        S.ivf_topk_partitioned(spark, lsh_path, Q, 5)


def test_bandstore_self_configures_and_append_checks(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.filter("source <> 'src0'")
    batch = docs.filter("source = 'src0'")
    path = str(tmp_path / "bands")
    BS.write_bands(corpus, path, "doc_id", "text", kb_parts=64)
    assert storemeta.read_params(path) == {
        "kind": "minhash_bands", "kb_parts": 64
    }
    # probe resolves kb_parts=64 from the sidecar (default arg is None)
    got = BS.incremental_pairs_against_store(
        spark, path, batch, "doc_id", "text", threshold=0.25
    )
    want = BS.incremental_pairs_against_store(
        spark, path, batch, "doc_id", "text", threshold=0.25, kb_parts=64
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    with pytest.raises(storemeta.StoreParamsError):
        BS.incremental_pairs_against_store(
            spark, path, batch, "doc_id", "text", kb_parts=128
        )
    with pytest.raises(storemeta.StoreParamsError):
        BS.append_bands(batch, path, "doc_id", "text", kb_parts=128)


def test_probe_and_ingest_cross_batch(spark, tmp_path):
    """Two sequential batches through probe_and_ingest: batch 2 must be
    deduped against batch 1's appended survivors, and nothing stays
    persisted afterwards (the landing-zone leak fix)."""
    text = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text="totally unrelated words here okay then")]
    )
    path = str(tmp_path / "bands")
    out = str(tmp_path / "pairs")
    BS.write_bands(corpus, path, "doc_id", "text")
    # other tests in the shared session may hold persisted frames;
    # assert the ingest loop adds NONE (relative, not absolute)
    cached_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    b1 = spark.createDataFrame([Row(doc_id=2, text=text)])
    BS.probe_and_ingest(spark, path, b1, "doc_id", "text", out,
                        threshold=0.5)
    b2 = spark.createDataFrame([Row(doc_id=3, text=text)])
    BS.probe_and_ingest(spark, path, b2, "doc_id", "text", out,
                        threshold=0.5)
    pairs = sorted(
        (r.new_id, r.corpus_id, r.est_jaccard)
        for r in spark.read.parquet(out).collect()
    )
    assert pairs == [(3, 2, 1.0)]
    # doc 3 was a duplicate -> NOT ingested: a copy of it still only
    # matches doc 2 (the survivor), proving non-survivors stay out
    b3 = spark.createDataFrame([Row(doc_id=4, text=text)])
    BS.probe_and_ingest(spark, path, b3, "doc_id", "text", out,
                        threshold=0.5)
    pairs = sorted(
        (r.new_id, r.corpus_id) for r in spark.read.parquet(out).collect()
    )
    assert pairs == [(3, 2), (4, 2)]
    # bounded state: no frames left persisted by the ingest loop
    cached_after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert cached_after == cached_before


def test_probe_and_ingest_retry_idempotent(spark, tmp_path):
    """foreachBatch re-runs a failed batch: with batch_id the pairs
    land per-batch with overwrite (no double-append), and the band
    append's at-least-once duplicates stay benign — the probe join is
    distinct and self-pairs are filtered."""
    text = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text=text)]
    )
    path = str(tmp_path / "bands")
    out = str(tmp_path / "pairs")
    BS.write_bands(corpus, path, "doc_id", "text")
    b1 = spark.createDataFrame([Row(doc_id=2, text=text + " extra")])
    # run the SAME batch twice — simulated retry after a crash that
    # already appended the survivors' bands
    for _ in range(2):
        BS.probe_and_ingest(spark, path, b1, "doc_id", "text", out,
                            threshold=0.5, batch_id=0)
    pairs = [
        (r.new_id, r.corpus_id)
        for r in spark.read.parquet(f"{out}/batch-*").collect()
    ]
    # one pair, once: no double-append, and no (2, 2) self-pair from
    # the first attempt's appended bands
    assert pairs == [(2, 1)]


def test_append_ivf_equals_whole_write(spark, sf_dir, tmp_path):
    """Incremental IVF ingest: write corpus, append an epoch assigned
    by the store's own sidecar centroids — probing must equal a store
    written whole, and compaction after a simulated retry must shrink
    the store without changing the probe."""
    from distributed_computing_projects_spark.operators import (
        similarity as S,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.filter("vec_id % 10 != 0")
    epoch = emb.filter("vec_id % 10 = 0")
    q = [0.1] * 64

    whole = str(tmp_path / "whole")
    S.write_ivf(emb, whole, "vec_id", "embedding")
    expected = [(r.id, round(r.cosine, 9)) for r in
                S.ivf_topk_partitioned(spark, whole, q, 7).collect()]

    incr = str(tmp_path / "incr")
    S.write_ivf(corpus, incr, "vec_id", "embedding")
    S.append_ivf(epoch, incr, "vec_id", "embedding")
    got = [(r.id, round(r.cosine, 9)) for r in
           S.ivf_topk_partitioned(spark, incr, q, 7).collect()]
    assert got == expected

    # retry: the epoch lands twice; compaction reclaims it exactly
    S.append_ivf(epoch, incr, "vec_id", "embedding")
    before, after = S.compact_ivf_store(spark, incr)
    assert before > after == emb.count()
    got2 = [(r.id, round(r.cosine, 9)) for r in
            S.ivf_topk_partitioned(spark, incr, q, 7).collect()]
    assert got2 == expected


def test_append_ivf_requires_ivf_sidecar(spark, tmp_path):
    import os

    import pytest

    from distributed_computing_projects_spark.operators import (
        similarity as S,
        storemeta,
    )

    p = str(tmp_path / "nostore")
    os.makedirs(p, exist_ok=True)
    df = spark.createDataFrame([(1, [0.0] * 64)], "id bigint, v array<float>")
    with pytest.raises(storemeta.StoreParamsError):
        S.append_ivf(df, p, "id", "v")


def test_ivf_probe_is_duplicate_safe_without_compaction(spark, sf_dir,
                                                        tmp_path):
    """At-least-once epochs must not eat top-k slots even BEFORE
    compaction runs: the partitioned probe dedups exact-duplicate
    rows."""
    from distributed_computing_projects_spark.operators import (
        similarity as S,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [0.1] * 64
    clean = str(tmp_path / "clean")
    S.write_ivf(emb, clean, "vec_id", "embedding")
    expected = [r.id for r in
                S.ivf_topk_partitioned(spark, clean, q, 7).collect()]

    dup = str(tmp_path / "dup")
    S.write_ivf(emb, dup, "vec_id", "embedding")
    S.append_ivf(emb.limit(50), dup, "vec_id", "embedding")  # retry
    got = [r.id for r in
           S.ivf_topk_partitioned(spark, dup, q, 7).collect()]
    assert got == expected
    assert len(set(got)) == len(got) == 7


def test_append_bucketed_equals_whole_write(spark, sf_dir, tmp_path):
    """LSH-store epoch append (sidecar n_planes) + retry compaction:
    the probe must equal a store written whole throughout."""
    from distributed_computing_projects_spark.operators import (
        similarity as S,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.filter("vec_id % 10 != 0")
    epoch = emb.filter("vec_id % 10 = 0")
    q = [0.1] * 64

    whole = str(tmp_path / "whole")
    S.write_bucketed(emb, whole, "vec_id", "embedding")
    expected = [(r.id, round(r.cosine, 9)) for r in
                S.lsh_topk_bucketed(spark, whole, q, 7,
                                    probe_hamming=1).collect()]

    incr = str(tmp_path / "incr")
    S.write_bucketed(corpus, incr, "vec_id", "embedding")
    S.append_bucketed(epoch, incr, "vec_id", "embedding")
    S.append_bucketed(epoch, incr, "vec_id", "embedding")  # retry
    got = [(r.id, round(r.cosine, 9)) for r in
           S.lsh_topk_bucketed(spark, incr, q, 7,
                               probe_hamming=1).collect()]
    assert got == expected  # duplicate-safe even before compaction
    before, after = S.compact_bucketed_store(spark, incr)
    assert before > after == emb.count()
    got2 = [(r.id, round(r.cosine, 9)) for r in
            S.lsh_topk_bucketed(spark, incr, q, 7,
                                probe_hamming=1).collect()]
    assert got2 == expected


def test_append_bucketed_tables_equals_whole_write(spark, sf_dir,
                                                   tmp_path):
    """Band-OR store epoch append (sidecar n_planes + n_tables) +
    retry compaction: the multi-probe top-k must equal a store
    written whole throughout."""
    from distributed_computing_projects_spark.operators import (
        autoplanes as AP,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.filter("vec_id % 10 != 0")
    epoch = emb.filter("vec_id % 10 = 0")
    q = [0.1] * 64
    n_vecs = emb.count()

    whole = str(tmp_path / "whole")
    AP.write_bucketed_tables(emb, whole, "vec_id", "embedding",
                             n_planes=6, n_tables=3)
    expected = [(r.id, round(r.cosine, 9)) for r in
                AP.lsh_topk_tables(spark, whole, q, 7).collect()]

    incr = str(tmp_path / "incr")
    AP.write_bucketed_tables(corpus, incr, "vec_id", "embedding",
                             n_planes=6, n_tables=3)
    AP.append_bucketed_tables(epoch, incr, "vec_id", "embedding")
    AP.append_bucketed_tables(epoch, incr, "vec_id", "embedding")  # retry
    got = [(r.id, round(r.cosine, 9)) for r in
           AP.lsh_topk_tables(spark, incr, q, 7).collect()]
    assert got == expected  # probe distinct makes the retry benign
    before, after = AP.compact_tables_store(spark, incr)
    assert before > after == n_vecs * 3  # one row per (vector, table)
    got2 = [(r.id, round(r.cosine, 9)) for r in
            AP.lsh_topk_tables(spark, incr, q, 7).collect()]
    assert got2 == expected


# ------------------------------------------- commit_swap crash recovery


def _fake_store(p: str, tag: str) -> None:
    os.makedirs(p)
    with open(os.path.join(p, "part-00000.parquet"), "w") as f:
        f.write(tag)
    storemeta.write_params(p, "lsh_bucketed", {"n_planes": 3})


def _store_tag(p: str) -> str:
    with open(os.path.join(p, "part-00000.parquet")) as f:
        return f.read()


def test_recover_swap_rolls_forward_between_renames(tmp_path):
    """Crash between commit_swap's two renames: the live path is gone,
    the old store sits at __pre_compact__, the VERIFIED rewrite at
    __compact__. Recovery rolls forward to the rewrite."""
    path = str(tmp_path / "store")
    _fake_store(path, "old")
    _fake_store(path + ".__compact__", "new")
    os.rename(path, path + ".__pre_compact__")  # first rename landed
    assert storemeta.recover_swap(path) == "completed"
    assert _store_tag(path) == "new"
    assert not os.path.exists(path + ".__pre_compact__")
    assert not os.path.exists(path + ".__compact__")


def test_recover_swap_rolls_back_without_verified_rewrite(tmp_path):
    """Same crash point but the rewrite is unverified (no sidecar —
    e.g. the crash also corrupted it): recovery restores the old
    store rather than promoting an unverified directory."""
    path = str(tmp_path / "store")
    _fake_store(path, "old")
    os.makedirs(path + ".__compact__")  # rewrite without sidecar
    os.rename(path, path + ".__pre_compact__")
    assert storemeta.recover_swap(path) == "rolled_back"
    assert _store_tag(path) == "old"


def test_recover_swap_cleans_leftovers_and_noops(tmp_path):
    path = str(tmp_path / "store")
    _fake_store(path, "live")
    _fake_store(path + ".__pre_compact__", "stale")
    _fake_store(path + ".__compact__", "stale")
    assert storemeta.recover_swap(path) == "cleaned"
    assert _store_tag(path) == "live"
    assert storemeta.recover_swap(path) == "noop"
    with pytest.raises(storemeta.StoreParamsError, match="nothing"):
        storemeta.recover_swap(str(tmp_path / "absent"))


def test_compaction_interrupted_between_renames_recovers(
    spark, sf_dir, tmp_path, monkeypatch
):
    """End-to-end: a real band-store compaction whose commit_swap dies
    BETWEEN the two renames (VERDICT r8 'what's missing' #3). The
    pre-compact store must be left intact at __pre_compact__, and
    recover_swap must yield a store whose probe results are unchanged."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter("source <> 'src0'")
    batch = docs.filter("source = 'src0'")
    path = str(tmp_path / "bands")
    BS.write_bands(corpus, path, "doc_id", "text")
    BS.append_bands(corpus.limit(20), path, "doc_id", "text")

    def probe():
        return sorted(
            (r.new_id, r.corpus_id, round(r.est_jaccard, 9))
            for r in BS.incremental_pairs_against_store(
                spark, path, batch, "doc_id", "text", threshold=0.25
            ).collect()
        )

    pre = probe()

    real_rename = os.rename
    calls = {"n": 0}

    def dying_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated crash between the two renames")
        real_rename(src, dst)

    monkeypatch.setattr(storemeta.os, "rename", dying_rename)
    with pytest.raises(OSError, match="simulated crash"):
        BS.compact_store(spark, path)
    monkeypatch.undo()

    # the crash window's contract: old store intact at __pre_compact__,
    # verified rewrite at __compact__, nothing live at path
    assert not os.path.exists(path)
    assert os.path.exists(path + ".__pre_compact__")
    assert storemeta.read_params(path + ".__compact__") is not None

    assert storemeta.recover_swap(path) == "completed"
    assert probe() == pre
    # rolled forward to the compacted store: one row per (id, band)
    store = spark.read.parquet(path)
    assert store.count() == store.select("id", "band").distinct().count()


# ------------------------------------------- versioned-pointer backend


def _versioned_fake_store(path: str, tag: str) -> None:
    _fake_store(path, tag)
    storemeta.convert_to_versioned(path)


def test_convert_to_versioned_moves_data_and_is_idempotent(tmp_path):
    path = str(tmp_path / "store")
    _fake_store(path, "live")
    v0 = storemeta.convert_to_versioned(path)
    assert v0 == os.path.join(path, "v=0")
    assert storemeta.data_path(path) == v0
    assert _store_tag(v0) == "live"
    assert not os.path.exists(os.path.join(path, "part-00000.parquet"))
    # sidecar keeps its params and gains the pointer
    meta = storemeta.read_params(path)
    assert meta[storemeta.VERSION_KEY] == 0
    # idempotent
    assert storemeta.convert_to_versioned(path) == v0
    # rename-mode stores resolve to themselves
    other = str(tmp_path / "plain")
    _fake_store(other, "x")
    assert storemeta.data_path(other) == other


def test_versioned_commit_flips_pointer_and_gcs(tmp_path):
    path = str(tmp_path / "store")
    _versioned_fake_store(path, "old")
    tmp = path + ".__compact__"
    _fake_store(tmp, "new")
    storemeta.commit_swap_versioned(path, tmp)
    meta = storemeta.read_params(path)
    assert meta[storemeta.VERSION_KEY] == 1
    assert _store_tag(storemeta.data_path(path)) == "new"
    assert not os.path.exists(os.path.join(path, "v=0"))
    assert not os.path.exists(tmp)
    # path itself never disappeared (no rename window): still a dir
    assert os.path.isdir(path)


def test_versioned_commit_refuses_rename_mode_store(tmp_path):
    path = str(tmp_path / "store")
    _fake_store(path, "old")  # no version field
    _fake_store(path + ".__compact__", "new")
    with pytest.raises(storemeta.StoreParamsError, match="not a versioned"):
        storemeta.commit_swap_versioned(path, path + ".__compact__")


def test_versioned_crash_before_pointer_flip_rolls_back(tmp_path):
    """Cut point 1: the new version directory landed but the sidecar
    still points at the old version. The commit never happened —
    recovery deletes the unreferenced directory and readers keep
    seeing the old data throughout (no FileNotFound window, unlike
    rename mode)."""
    path = str(tmp_path / "store")
    _versioned_fake_store(path, "old")
    _fake_store(os.path.join(path, "v=1"), "new")  # rename landed
    _fake_store(path + ".__compact__", "scratch")  # rewrite leftover
    assert _store_tag(storemeta.data_path(path)) == "old"
    assert storemeta.recover_swap_versioned(path) == "cleaned"
    assert _store_tag(storemeta.data_path(path)) == "old"
    assert not os.path.exists(os.path.join(path, "v=1"))
    assert not os.path.exists(path + ".__compact__")


def test_versioned_crash_after_pointer_flip_rolls_forward(tmp_path):
    """Cut point 2: the sidecar flipped but the superseded version was
    not yet garbage-collected. The commit DID happen — recovery
    deletes the old version; the new data was already live."""
    path = str(tmp_path / "store")
    _versioned_fake_store(path, "old")
    _fake_store(os.path.join(path, "v=1"), "new")
    meta = storemeta.read_params(path)
    kind = meta.pop("kind")
    storemeta.write_params(path, kind, {**meta, storemeta.VERSION_KEY: 1})
    assert _store_tag(storemeta.data_path(path)) == "new"
    assert storemeta.recover_swap_versioned(path) == "cleaned"
    assert _store_tag(storemeta.data_path(path)) == "new"
    assert not os.path.exists(os.path.join(path, "v=0"))
    assert storemeta.recover_swap_versioned(path) == "noop"


def test_versioned_recover_raises_on_missing_pointed_version(tmp_path):
    path = str(tmp_path / "store")
    _versioned_fake_store(path, "live")
    import shutil

    shutil.rmtree(os.path.join(path, "v=0"))
    with pytest.raises(storemeta.StoreParamsError, match="data loss"):
        storemeta.recover_swap_versioned(path)


@pytest.mark.parametrize("cut", ["before_flip", "after_flip"])
def test_versioned_bandstore_compaction_crash_cut_points(
    spark, sf_dir, tmp_path, monkeypatch, cut
):
    """End-to-end on a REAL converted band store: compaction dies at
    each pointer-commit cut point; recovery restores an identical
    probe answer (old store before the flip, compacted store after),
    and a re-run compaction completes."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter("source <> 'src0'")
    batch = docs.filter("source = 'src0'")
    path = str(tmp_path / "bands")
    BS.write_bands(corpus, path, "doc_id", "text")
    storemeta.convert_to_versioned(path)
    BS.append_bands(corpus.limit(20), path, "doc_id", "text")

    def probe():
        return sorted(
            (r.new_id, r.corpus_id, round(r.est_jaccard, 9))
            for r in BS.incremental_pairs_against_store(
                spark, path, batch, "doc_id", "text", threshold=0.25
            ).collect()
        )

    pre = probe()
    assert spark.read.parquet(storemeta.data_path(path)).count() > \
        corpus.count()  # the append really landed in the version dir

    if cut == "before_flip":
        real_rename = os.rename

        def dying_rename(src, dst):
            if dst.endswith(os.sep + "v=1") or dst.endswith("/v=1"):
                raise OSError("simulated crash before the pointer flip")
            real_rename(src, dst)

        monkeypatch.setattr(storemeta.os, "rename", dying_rename)
        with pytest.raises(OSError, match="simulated crash"):
            BS.compact_store(spark, path)
        monkeypatch.undo()
        assert storemeta.read_params(path)[storemeta.VERSION_KEY] == 0
    else:
        import shutil

        real_rmtree = shutil.rmtree

        def dying_rmtree(p, *a, **k):
            if os.sep + "v=0" in str(p):
                raise OSError("simulated crash after the pointer flip")
            real_rmtree(p, *a, **k)

        # storemeta imports shutil inside the function, so patching the
        # module-global shutil.rmtree intercepts the GC step
        monkeypatch.setattr("shutil.rmtree", dying_rmtree)
        with pytest.raises(OSError, match="simulated crash"):
            BS.compact_store(spark, path)
        monkeypatch.undo()
        assert storemeta.read_params(path)[storemeta.VERSION_KEY] == 1

    storemeta.recover_swap_versioned(path)
    assert probe() == pre  # identical answer either way
    # a re-run compaction completes and dedups the appended copies
    before, after = BS.compact_store(spark, path)
    assert after <= before
    assert probe() == pre


def test_versioned_ivf_store_probe_append_compact(spark, sf_dir,
                                                  tmp_path):
    """The similarity/pq data_path routing on a CONVERTED store: after
    convert_to_versioned, probes read the pointed version dir, appends
    land inside it, and compaction commits through the POINTER backend
    (version bumps, no rename window) — probe results identical to an
    unconverted store throughout."""
    from distributed_computing_projects_spark.operators import (
        similarity as S,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.filter("vec_id % 10 != 0")
    epoch = emb.filter("vec_id % 10 = 0")
    q = [0.1] * 64

    plain = str(tmp_path / "plain")
    S.write_ivf(emb, plain, "vec_id", "embedding")
    expected = [(r.id, round(r.cosine, 9)) for r in
                S.ivf_topk_partitioned(spark, plain, q, 7).collect()]

    ver = str(tmp_path / "ver")
    S.write_ivf(corpus, ver, "vec_id", "embedding")
    storemeta.convert_to_versioned(ver)
    assert storemeta.read_params(ver)[storemeta.VERSION_KEY] == 0
    S.append_ivf(epoch, ver, "vec_id", "embedding")
    # the append landed inside v=0, not at the store root
    assert spark.read.parquet(storemeta.data_path(ver)).count() == \
        emb.count()
    got = [(r.id, round(r.cosine, 9)) for r in
           S.ivf_topk_partitioned(spark, ver, q, 7).collect()]
    assert got == expected

    # duplicate-append + compaction: the pointer backend commits
    # (version 0 -> 1), rows shrink back, probe unchanged
    S.append_ivf(epoch, ver, "vec_id", "embedding")
    before, after = S.compact_ivf_store(spark, ver)
    assert before > after == emb.count()
    assert storemeta.read_params(ver)[storemeta.VERSION_KEY] == 1
    assert not os.path.exists(os.path.join(ver, "v=0"))
    got2 = [(r.id, round(r.cosine, 9)) for r in
            S.ivf_topk_partitioned(spark, ver, q, 7).collect()]
    assert got2 == expected
