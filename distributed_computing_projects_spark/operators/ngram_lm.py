"""Bigram language-model quality filtering (CCNet-style perplexity).

Public background: CCNet (Wenzek et al., LREC 2020) scores web text by
n-gram LM perplexity against a trusted corpus and keeps the fluent
tail; stupid backoff (Brants et al., EMNLP 2007, "Large Language
Models in Machine Translation") replaces discounted smoothing with a
fixed-penalty count ratio — the right scoring rule for a distributed
engine because the "model" is nothing but two count tables the engine
already knows how to build (hash aggregates) and apply (equi-joins).

Reference parity note: the reference engine (wordcount/grep/vote apps,
mp3/src) has no LM surface; this is scale-extension surface for the
training-data pipeline tier (SURVEY §7.1 M6), like the dedup/ANN
families.

Shape at 100 TB:

- **training** = two hash aggregates over the held-in split (unigram
  and bigram counts). Count tables are vocabulary-sized — orders of
  magnitude smaller than the corpus — and partial aggregation does the
  heavy lifting map-side.
- **scoring** = one explode of the scored corpus joined against the
  count tables on the gram key. At small SF Spark broadcasts the
  counts; at web scale they stop fitting and the same plan degrades
  gracefully to shuffle hash joins on the gram key — no plan rewrite,
  no driver-side model object. The model never transits the driver.
- **per-doc reduction** = one hash aggregate keyed by doc id; the
  per-doc state is bounded by document length (the collected log-prob
  list), never by corpus size.

Numeric determinism: per-bigram log-probs are pure functions of
integer counts (both engines evaluate ``ln`` on IEEE doubles), but a
per-doc SUM of doubles is order-dependent, and the corpus contains
exact-duplicate documents whose scores must tie EXACTLY for the rank
tie-break (doc id) to agree cross-engine. So the per-doc sum is a
PINNED FOLD — sort the log-prob multiset, then fold left-to-right —
the same discipline as ``ivf_train`` centroid means and the PQ ADC
sum: Spark ``aggregate(array_sort(collect_list(lp)), 0D, +)`` vs
DuckDB ``list_reduce(list_sort(list(lp)), +)`` reproduce every sum
bit-for-bit (the 0-init is exact: ``0.0 + x == x`` for nonzero x).
Document RANKS on avg log-prob are then cross-engine stable: equal
token streams give bit-equal sums (tie falls to doc id identically),
distinct streams give score gaps orders of magnitude above ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from distributed_computing_projects_spark.functions import text as T

# Held-in training split: doc_id % TRAIN_MOD != 0 (~80% of the corpus).
# Deterministic and dual-dialect (same arithmetic both engines) — the
# stand-in for CCNet's "trusted corpus" (they train on Wikipedia).
TRAIN_MOD = 5

# Stupid backoff penalty (Brants et al. use 0.4).
BACKOFF = 0.4


def train_counts(
    docs: DataFrame, id_col: str, text_col: str, train_mod: int = TRAIN_MOD
) -> tuple[DataFrame, DataFrame]:
    """The bigram LM "model": ``(uni, bi)`` count tables over the
    held-in split — ``uni(w, c1)`` unigram counts, ``bi(gram, c12)``
    bigram counts (gram = the two tokens space-joined, matching
    :func:`functions.text.ngrams`). Two scans of the split, two hash
    aggregates; the tables are vocabulary-sized."""
    train = docs.filter(F.col(id_col) % train_mod != 0)
    uni = (
        train.select(
            F.explode(F.expr(T.tokens(text_col, "spark"))).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("c1"))
    )
    bi = (
        train.select(
            F.explode(F.expr(T.ngrams(text_col, 2, "spark"))).alias("gram")
        )
        .groupBy("gram")
        .agg(F.count("*").cast("bigint").alias("c12"))
    )
    return uni, bi


def _logprob_expr() -> str:
    """Per-bigram stupid-backoff log-prob over joined count columns
    ``c12`` (bigram), ``c1`` (context unigram), ``c2`` (continuation
    unigram) and the broadcast scalar ``n_tok`` (training token count):

    - bigram seen:        ln(c12 / c1)
    - backoff to unigram: ln(BACKOFF) + ln(c2 / n_tok)
    - OOV continuation:   ln(BACKOFF) + ln(1 / n_tok)  (count-1 floor)

    ``c12 IS NOT NULL`` implies ``c1 IS NOT NULL`` (a training bigram's
    first token is a training token), so the CASE is total."""
    return (
        f"CASE WHEN c12 IS NOT NULL THEN"
        f"   ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))"
        f" WHEN c2 IS NOT NULL THEN"
        f"   ln({BACKOFF!r}) + ln(CAST(c2 AS DOUBLE) / n_tok)"
        f" ELSE ln({BACKOFF!r}) + ln(1.0 / n_tok) END"
    )


def score_docs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    train_mod: int = TRAIN_MOD,
) -> DataFrame:
    """Score EVERY document (training split included — CCNet scores the
    whole crawl) against the bigram LM trained on the held-in split.

    Returns one row per document with >= 1 bigram:
    ``(id, n_bigrams, n_hit, n_backoff, n_oov, sum_lp, avg_lp)`` —
    the integer diagnostics (how many bigrams resolved at each backoff
    tier) plus the pinned-fold log-prob sum and its per-bigram mean.
    0/1-token documents produce no bigrams and drop out identically in
    both engines (explode of an empty array)."""
    uni, bi = train_counts(docs, id_col, text_col, train_mod)
    # uni feeds THREE consumers (the w1 join, the w2 join, the token
    # total); without a persist each one re-runs the training-split
    # explode+aggregate — 3 extra corpus scans at 100 TB. The persisted
    # table is vocabulary-sized, not corpus-sized.
    uni = uni.persist()
    n_tok = float(
        uni.agg(F.sum("c1").cast("double").alias("n")).collect()[0]["n"]
    )
    return score_docs_against(docs, id_col, text_col, uni, bi, n_tok)


def score_docs_against(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    uni: DataFrame,
    bi: DataFrame,
    n_tok: float,
) -> DataFrame:
    """Score ``docs`` against PRE-BUILT count tables — the
    model-serving entry point (:func:`score_docs` trains then
    delegates here; the streaming scorer trains once and calls this
    per micro-batch). ``n_tok`` is the training token total, a single
    scalar that travels as a literal."""
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.expr(T.ngrams(text_col, 2, "spark"))).alias("gram"),
    ).select(
        "id",
        "gram",
        F.substring_index("gram", " ", 1).alias("w1"),
        F.substring_index("gram", " ", -1).alias("w2"),
    )
    joined = (
        grams.join(bi, "gram", "left")
        .join(uni.withColumnRenamed("w", "w1"), "w1", "left")
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c1").alias("c2")),
            "w2",
            "left",
        )
        .withColumn("n_tok", F.lit(float(n_tok)))
        .withColumn("lp", F.expr(_logprob_expr()))
    )
    return (
        joined.groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.count("c12").cast("bigint").alias("n_hit"),
            F.sum(
                F.when(
                    F.col("c12").isNull() & F.col("c2").isNotNull(), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_backoff"),
            F.sum(F.when(F.col("c2").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            F.expr(
                "aggregate(array_sort(collect_list(lp)),"
                " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
            ).alias("sum_lp"),
        )
        .withColumn("avg_lp", F.col("sum_lp") / F.col("n_bigrams"))
    )
