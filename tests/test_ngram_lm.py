"""Bigram-LM quality filtering: backoff-tier semantics on a toy corpus
where every count is hand-checkable, plus the pinned-fold determinism
claim the rank queries lean on (operators/ngram_lm.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from distributed_computing_projects_spark.operators import ngram_lm as LM


def _toy(spark):
    # TRAIN_MOD = 5: ids 1..4 train, id 5 and 10 are held out.
    rows = [
        (1, "the cat sat"),
        (2, "the cat ran"),
        (3, "the dog sat"),
        (4, "a cat sat"),
        (5, "the cat sat"),          # held out; every bigram seen
        (10, "the zebra sat"),       # held out; 'zebra' is OOV
        (15, "word"),                # held out; 1 token -> no bigrams
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_train_counts_toy(spark):
    uni, bi = LM.train_counts(_toy(spark), "doc_id", "text")
    u = {r["w"]: r["c1"] for r in uni.collect()}
    b = {r["gram"]: r["c12"] for r in bi.collect()}
    # training split = docs 1..4 (12 tokens)
    assert u == {"the": 3, "a": 1, "cat": 3, "dog": 1, "sat": 3, "ran": 1}
    assert b == {
        "the cat": 2, "cat sat": 2, "the dog": 1, "dog sat": 1,
        "a cat": 1, "cat ran": 1,
    }


def test_score_docs_backoff_tiers(spark):
    scored = {
        r["id"]: r
        for r in LM.score_docs(_toy(spark), "doc_id", "text").collect()
    }
    # doc 15 has no bigrams: absent, not a zero row
    assert 15 not in scored
    # doc 5 "the cat sat": both bigrams seen verbatim
    d5 = scored[5]
    assert (d5["n_bigrams"], d5["n_hit"], d5["n_backoff"], d5["n_oov"]) \
        == (2, 2, 0, 0)
    # exact log-prob: ln(c12/c1) summed = ln(2/3) + ln(2/3)
    assert math.isclose(d5["sum_lp"], 2 * math.log(2 / 3), rel_tol=1e-12)
    # doc 10 "the zebra sat": 'the zebra' has known w1, OOV w2 ->
    # OOV tier; 'zebra sat' unknown bigram, known continuation ->
    # backoff tier
    d10 = scored[10]
    assert (d10["n_bigrams"], d10["n_hit"], d10["n_backoff"],
            d10["n_oov"]) == (2, 0, 1, 1)
    n_tok = 12.0
    expect = (math.log(LM.BACKOFF) + math.log(1.0 / n_tok)) + (
        math.log(LM.BACKOFF) + math.log(3.0 / n_tok)
    )
    # sum is a pinned sorted fold; with two terms sorted ascending the
    # OOV term (more negative) adds first
    lo, hi = sorted([
        math.log(LM.BACKOFF) + math.log(1.0 / n_tok),
        math.log(LM.BACKOFF) + math.log(3.0 / n_tok),
    ])
    assert d10["sum_lp"] == (0.0 + lo) + hi
    assert math.isclose(d10["sum_lp"], expect, rel_tol=1e-12)


def test_duplicate_docs_tie_bit_exactly(spark):
    # The cross-engine rank tie-break on doc_id is only sound if docs
    # with identical token streams get IDENTICAL sums. The pinned fold
    # guarantees it regardless of partitioning.
    rows = [(i, "alpha beta gamma delta " * 8) for i in range(1, 30)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(7)
    sums = [
        r["sum_lp"]
        for r in LM.score_docs(docs, "doc_id", "text").collect()
    ]
    assert len(set(sums)) == 1


def test_scored_corpus_covers_all_multitoken_docs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = LM.score_docs(docs, "doc_id", "text")
    n_multi = docs.filter(
        F.size(F.expr("filter(split(text, '\\\\s+'), x -> x <> '')")) >= 2
    ).count()
    assert scored.count() == n_multi
    # tier counts partition the bigrams
    bad = scored.filter(
        F.col("n_hit") + F.col("n_backoff") + F.col("n_oov")
        != F.col("n_bigrams")
    ).count()
    assert bad == 0
