"""N-gram language-model query family: distributed bigram LM training
(count tables), CCNet-style stupid-backoff perplexity ranking of the
whole corpus, and the integer-exact OOV quality gate. Scale-extension
surface (SURVEY §7.1 M6) — the reference engine has no LM tier.
Operator: ``operators/ngram_lm.py``; numeric-determinism contract
(pinned per-doc fold) documented there."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from distributed_computing_projects_spark.functions import text as T
from distributed_computing_projects_spark.operators import ngram_lm as LM
from distributed_computing_projects_spark.queries import query
from distributed_computing_projects_spark.sources.registry import load_table
from distributed_computing_projects_spark.queries.ext_fragments import (
    _TOKS_D,
)

_GRAMS2_D = T.ngrams("text", 2, "duck")

# The LM "model" as oracle CTEs: the held-in split, its unigram and
# bigram count tables, and the training token total — the same two
# hash aggregates `operators/ngram_lm.train_counts` runs.
_LM_MODEL_CTES = f"""
    train AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id % {LM.TRAIN_MOD} <> 0),
    uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c1
      FROM (SELECT unnest({_TOKS_D}) AS w FROM train) GROUP BY w),
    bi AS (
      SELECT g AS gram, CAST(count(*) AS BIGINT) AS c12
      FROM (SELECT unnest({_GRAMS2_D}) AS g FROM train) GROUP BY g),
    tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS n_tok FROM uni)
"""

# Scoring CTEs on top of the model: every document's bigrams joined
# against the count tables, the stupid-backoff log-prob per bigram,
# and the per-doc reduction with the PINNED float fold (list_sort +
# list_reduce == Spark's array_sort + aggregate(0D, +); see
# operators/ngram_lm.py docstring for why the sort is load-bearing).
_LM_SCORE_CTES = f"""
    grams AS (
      SELECT doc_id, unnest({_GRAMS2_D}) AS gram FROM documents),
    sg AS (
      SELECT doc_id, gram,
             split_part(gram, ' ', 1) AS w1,
             split_part(gram, ' ', 2) AS w2
      FROM grams),
    jj AS (
      SELECT s.doc_id, b.c12, u1.c1 AS c1, u2.c1 AS c2, t.n_tok
      FROM sg s
      LEFT JOIN bi b ON s.gram = b.gram
      LEFT JOIN uni u1 ON s.w1 = u1.w
      LEFT JOIN uni u2 ON s.w2 = u2.w
      CROSS JOIN tot t),
    j AS (
      SELECT doc_id, c12, c1, c2, n_tok, {LM._logprob_expr()} AS lp
      FROM jj),
    perdoc AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(count(c12) AS BIGINT) AS n_hit,
             CAST(sum(CASE WHEN c12 IS NULL AND c2 IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff,
             CAST(sum(CASE WHEN c2 IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_oov,
             list_reduce(list_sort(list(lp)), (acc, x) -> acc + x)
               AS sum_lp
      FROM j GROUP BY doc_id)
"""


LM_TOP_BIGRAMS = 20


@query(
    "lm_bigram_counts",
    oracle=f"""
    WITH {_LM_MODEL_CTES}
    SELECT gram, c12 AS cnt, rnk FROM (
      SELECT gram, c12,
             CAST(row_number() OVER (ORDER BY c12 DESC, gram) AS BIGINT)
               AS rnk
      FROM bi)
    WHERE rnk <= {LM_TOP_BIGRAMS}
    """,
    doc="The trained LM artifact itself: top-20 bigrams of the held-in "
        "split by count — distributed n-gram LM training IS this hash "
        "aggregate (Brants et al., EMNLP 2007 built exactly these "
        "count tables with MapReduce). Integer counts, rank window "
        "with (count desc, gram) tie-break: fully hash-comparable.",
)
def q_lm_bigram_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    _, bi = LM.train_counts(docs, "doc_id", "text")
    w = Window.orderBy(F.desc("c12"), F.asc("gram"))
    return (
        bi.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= LM_TOP_BIGRAMS)
        .select("gram", F.col("c12").alias("cnt"), "rnk")
    )


@query(
    "lm_perplexity_rank",
    headline=True,
    oracle=f"""
    WITH {_LM_MODEL_CTES}, {_LM_SCORE_CTES}
    SELECT doc_id, n_bigrams, n_hit, n_backoff, n_oov, rnk FROM (
      SELECT doc_id, n_bigrams, n_hit, n_backoff, n_oov,
             CAST(row_number() OVER (
               ORDER BY sum_lp / n_bigrams DESC, doc_id) AS BIGINT)
               AS rnk
      FROM perdoc)
    """,
    doc="CCNet-style corpus ranking by bigram-LM fluency: every doc "
        "scored against the held-in model with stupid backoff, ranked "
        "best-avg-log-prob first. Compared columns are the exact "
        "integer backoff-tier diagnostics plus the RANK, not the raw "
        "float score (tfidf_top_terms' ulp rationale); exact-duplicate "
        "docs tie bit-exactly thanks to the pinned per-doc fold, so "
        "the doc_id tie-break agrees cross-engine.",
)
def q_lm_perplexity_rank(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    scored = LM.score_docs(docs, "doc_id", "text")
    w = Window.orderBy(F.desc("avg_lp"), F.asc("id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .select(
            F.col("id").alias("doc_id"),
            "n_bigrams", "n_hit", "n_backoff", "n_oov", "rnk",
        )
    )


@query(
    "lm_ccnet_buckets",
    oracle=f"""
    WITH {_LM_MODEL_CTES}, {_LM_SCORE_CTES},
    tiled AS (
      SELECT doc_id,
             ntile(3) OVER (ORDER BY sum_lp / n_bigrams DESC, doc_id)
               AS tile
      FROM perdoc)
    SELECT t.doc_id,
           CASE t.tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                       ELSE 'tail' END AS bucket,
           d.lang
    FROM tiled t JOIN documents d ON t.doc_id = d.doc_id
    """,
    doc="CCNet's shipping decision: split the corpus into head / "
        "middle / tail perplexity TERTILES (Wenzek et al. release "
        "Common Crawl exactly this way) rather than a fixed float "
        "threshold — a relative cut is corpus-robust where an absolute "
        "one is degenerate (this synthetic corpus has zero OOV "
        "bigrams). ntile(3) over the pinned-fold score order is "
        "integer-exact: both engines assign the larger groups to the "
        "earlier tiles per the SQL standard, and the (score, doc_id) "
        "order is bit-stable cross-engine (see lm_perplexity_rank).",
)
def q_lm_ccnet_buckets(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    scored = LM.score_docs(docs, "doc_id", "text")
    w = Window.orderBy(F.desc("avg_lp"), F.asc("id"))
    tiled = scored.select(
        F.col("id").alias("doc_id"), F.ntile(3).over(w).alias("tile")
    )
    bucket = (
        F.when(F.col("tile") == 1, "head")
        .when(F.col("tile") == 2, "middle")
        .otherwise("tail")
    )
    return (
        tiled.join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", bucket.alias("bucket"), "lang")
    )
