"""BPE trainer/encoder: exactness against a pure-python reference
implementation (leftmost-greedy merge application, deterministic
count-desc/lexicographic argmax), cap and edge-case behavior, and
determinism across re-runs (operators/bpe.py)."""

from __future__ import annotations

import collections
import re

import pytest

from distributed_computing_projects_spark.operators import bpe as B


def _ref_train(texts, n_merges, max_word_len=B.MAX_WORD_LEN):
    words = collections.Counter()
    for t in texts:
        for w in re.split("[^a-z]+", t.lower()):
            if w and len(w) <= max_word_len:
                words[w] += 1
    wt = {tuple(w): c for w, c in words.items()}
    trace = []
    for rank in range(n_merges):
        pc = collections.Counter()
        for syms, c in wt.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (left, right), c = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        trace.append((rank, left, right, c))
        nxt: dict = {}
        for syms, cnt in wt.items():
            out: list = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + cnt
        wt = nxt
    return trace


def _ref_encode(text, merges):
    n_words = n_tokens = 0
    for w in re.split("[^a-z]+", text.lower()):
        if not w:
            continue
        syms = list(w)
        if len(w) <= B.MAX_WORD_LEN:
            for left, right in merges:
                out: list = []
                for x in syms:
                    if out and out[-1] == left and x == right:
                        out[-1] = left + right
                    else:
                        out.append(x)
                syms = out
        n_words += 1
        n_tokens += len(syms)
    return n_words, n_tokens


CORPORA = [
    ["the theme there, the other brother!",
     "hello hello world the theater",
     "a aa aaa the them"],
    ["banana bandana ban",  # self-overlapping an/na chains
     "anna banana nan"],
    ["x " * 30 + "yz", "zz zzz zzzz z"],
]


@pytest.mark.parametrize("texts", CORPORA)
def test_train_matches_pure_python_reference(spark, texts):
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in B.train_bpe(spark, docs, "text", 5)
           .orderBy("rank").collect()]
    assert got == _ref_train(texts, 5)


def test_encode_matches_reference_incl_long_word_fallback(spark):
    import pandas as pd

    texts = ["the theme " + "q" * 30 + " there",  # 30-char word: capped
             "hello other theater"]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": texts}))
    trace = _ref_train(texts, 4)
    merges = [(left, right) for _, left, right, _ in trace]
    rows = {r["id"]: r for r in
            B.encode_tokens(docs, "doc_id", "text", merges).collect()}
    for i, t in enumerate(texts):
        n_words, n_tokens = _ref_encode(t, merges)
        assert (rows[i]["n_words"], rows[i]["n_tokens"]) == (
            n_words, n_tokens), t


def test_train_deterministic_across_runs(spark):
    import pandas as pd

    texts = CORPORA[1]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    a = B.train_bpe(spark, docs, "text", 4).collect()
    b = B.train_bpe(spark, docs, "text", 4).collect()
    assert a == b


def test_train_exhausts_gracefully(spark):
    import pandas as pd

    # single 2-char word: only 1 merge possible, then pairs run dry
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["ab"]}))
    rows = B.train_bpe(spark, docs, "text", 5).collect()
    assert [(r["left"], r["right"]) for r in rows] == [("a", "b")]


def test_word_table_filters_and_caps(spark):
    import pandas as pd

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0],
        "text": ["Big BIG big " + "x" * (B.MAX_WORD_LEN + 1) + " 123"]}))
    rows = {r["w"]: r["cnt"]
            for r in B.word_table(docs, "text").collect()}
    assert rows == {"big": 3}


def test_merge_fold_rejects_non_alpha_symbols():
    with pytest.raises(ValueError):
        B._merge_fold("a'); DROP", "b")


def test_oracle_survives_pair_exhaustion(spark, tmp_path):
    """A corpus whose vocabulary exhausts pairs before N_MERGES rounds:
    the trainer stops merging, and the SQL oracle's per-round symbol
    tables must FALL BACK (empty m{k} must not wipe s{k} via the old
    cross join) — both engines replayed end-to-end via verify.run on a
    synthetic sf_dir."""
    import shutil

    from distributed_computing_projects_spark.sources.registry import (
        TABLE_NAMES,
    )
    from distributed_computing_projects_spark.verify import run

    import os

    import pandas as pd

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    # two-letter vocabulary: one merge (a,b) and the pair space is dry.
    # Written as a single file (pandas), matching the driver's layout —
    # DuckDB's view glob does not read Spark's directory output.
    pd.DataFrame({
        "doc_id": range(6), "text": ["ab ab ab"] * 6,
        "lang": ["en"] * 6, "source": ["s0"] * 6, "n_chars": [8] * 6,
    }).to_parquet(f"{sf}/documents.parquet")
    real = "/root/testdata/sf0.001"
    for t in TABLE_NAMES:
        if t != "documents":
            src = f"{real}/{t}.parquet"
            if os.path.isdir(src):
                shutil.copytree(src, f"{sf}/{t}.parquet")
            else:
                shutil.copy(src, f"{sf}/{t}.parquet")
    failed = run(spark, sf, only={"bpe_train_merges",
                                  "bpe_encode_tokens"}, out=lambda *_: None)
    assert not failed, failed
