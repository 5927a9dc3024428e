"""Trained document-quality classifier (fastText/DCLM-style), integer-exact.

Production training-data pipelines (CCNet, DCLM, FineWeb) run a *trained*
linear classifier over token features as the quality stage between heuristic
gating and materialization: a small labeled set teaches per-token weights,
then every document in the corpus is scored by a sum over its tokens. This
module implements that stage Spark-first:

  * **Weak labels** come from the existing heuristic gate
    (``GATE_MIN_TOKENS`` / ``GATE_MIN_DISTINCT``, the same predicate
    ``corpus_quality_gate`` applies) — self-distillation of the heuristic
    into a token-level model, exactly how bootstrap quality classifiers are
    built when no human labels exist.
  * **Training** is one explode + one hash aggregate: per-token
    (cnt_pos, cnt_neg) occurrence counts over the train split
    (``doc_id % TRAIN_MOD != TEST_REMAINDER``), min-df filtered to bound the
    vocabulary.
  * **Weights are integer-exact.** Instead of Naive Bayes log-odds (whose
    float sums are summation-order-dependent and so not reproducible across
    engines), the weight is the cross-multiplied rate difference

        w(t) = cnt_pos(t) * total_neg  -  cnt_neg(t) * total_pos

    which is positive iff the token's occurrence *rate* in positive docs
    exceeds its rate in negative docs (same sign as the NB log-odds), and is
    a pure BIGINT expression: the distributed per-document sum is exact and
    order-independent, so Spark and any ANSI engine agree bit-for-bit. This
    is the same reason production scorers quantize classifier weights.
  * **Scoring** is explode + broadcast-join(vocab) + hash aggregate:
    score(doc) = sum of w over token *occurrences*; predict positive iff
    score > 0. Docs with no in-vocab tokens score 0 via a join-back.

Scale notes (100 TB): training is one shuffle keyed by token with partial
aggregation; the min-df filter bounds the vocabulary so the weights table
broadcasts (a 1M-token vocab is ~30 MB). Scoring is therefore shuffle-free
per document batch except the final per-doc aggregate, which re-uses the
explode's doc_id grouping. int64 headroom: |w| <= total_pos*total_neg; at
corpus sizes where token-occurrence totals exceed ~3e9 the products need
DECIMAL(38,0) (or pre-dividing totals by their gcd) — the expression seam
is ``weight_expr``.

Reference parity: the reference engine's closest surface is the wordcount /
filter-aggregate tier (mp3/src/maple/wordcount.go:11 tokenization — the
same whitespace split ``functions/text.py tokens()`` reproduces); the
trained-classifier stage is an engine extension from the LLM-pipeline
requirements (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_computing_projects_spark.functions import text as T

# Train/test split: deterministic on doc_id so both engines agree.
TRAIN_MOD = 5
TEST_REMAINDER = 0
# Tokens must appear at least this often in the train split to enter the
# vocabulary (bounds the broadcast; drops overfit singletons).
MIN_DF = 5
# Weak-label thresholds — identical to corpus_quality_gate's text-only gate.
LABEL_MIN_TOKENS = 20
LABEL_MIN_DISTINCT = 0.3
TOP_WEIGHTS = 50


def labeled_docs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, toks, label): whitespace tokens + the weak quality label.

    label = n_tokens >= LABEL_MIN_TOKENS AND distinct_ratio >=
    LABEL_MIN_DISTINCT. The ratio is a single IEEE divide of exact
    integers, so threshold membership is engine-stable; empty-token docs
    are labeled false by the first conjunct before the 0/0 divide can
    matter (three-valued AND).
    """
    toks = T.tokens(text_col, "spark")
    return docs.select(
        F.col(id_col).alias("id"),
        F.expr(toks).alias("toks"),
        F.expr(
            f"size({toks}) >= {LABEL_MIN_TOKENS} AND "
            f"CAST(size(array_distinct({toks})) AS DOUBLE)"
            f" / CAST(size({toks}) AS DOUBLE) >= {LABEL_MIN_DISTINCT}"
        ).alias("label"),
    )


def _train_occurrences(labeled: DataFrame) -> DataFrame:
    train = labeled.filter(F.col("id") % TRAIN_MOD != TEST_REMAINDER)
    return train.select("label", F.explode("toks").alias("token"))


def token_weights(labeled: DataFrame) -> DataFrame:
    """Train: (token, cnt_pos, cnt_neg, weight) over the train split.

    One explode + one hash aggregate (partial agg applies — the shuffle
    carries (token, partial counts), not occurrences); the totals are a
    broadcast of a single aggregate row.
    """
    counts = (
        _train_occurrences(labeled)
        .groupBy("token")
        .agg(
            F.sum(F.when(F.col("label"), 1).otherwise(0))
            .cast("bigint").alias("cnt_pos"),
            F.sum(F.when(F.col("label"), 0).otherwise(1))
            .cast("bigint").alias("cnt_neg"),
        )
        .filter(F.col("cnt_pos") + F.col("cnt_neg") >= MIN_DF)
    )
    totals = counts.agg(
        F.sum("cnt_pos").cast("bigint").alias("total_pos"),
        F.sum("cnt_neg").cast("bigint").alias("total_neg"),
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "token",
        "cnt_pos",
        "cnt_neg",
        (F.col("cnt_pos") * F.col("total_neg")
         - F.col("cnt_neg") * F.col("total_pos"))
        .cast("bigint").alias("weight"),
    )


def top_weights(labeled: DataFrame, k: int = TOP_WEIGHTS) -> DataFrame:
    """The k most positively-weighted vocabulary tokens (ties by token).

    Integer sort keys only, so the cut is deterministic across engines.
    Global top-k: Spark plans this as TakeOrderedAndProject (no full sort).
    """
    w = token_weights(labeled)
    return w.orderBy(F.col("weight").desc(), F.col("token").asc()).limit(k)


def _split_scores(labeled: DataFrame, weights: DataFrame,
                  test_split: bool, with_label: bool) -> DataFrame:
    """Shared scoring plan for either split: (id[, label], score) with
    score the exact BIGINT sum of per-occurrence weights (0 for docs
    with no in-vocab tokens).

    The label (when carried) rides through the explode and the
    per-doc aggregate keys on (id, label) — label is functionally
    dependent on id, so this is the same grouping but needs NO
    join-back of the doc list (the naive score-then-rejoin shape
    costs a sort-merge join + two exchanges more). ``explode_outer``
    keeps zero-token docs as one null-token row; the left broadcast
    join gives them (and out-of-vocab tokens) a null weight that
    coalesces to 0. One builder serves scoring AND threshold
    calibration so the plan shape cannot silently diverge between
    them; identical weight subtrees also hit Spark's ReuseExchange."""
    w = F.broadcast(weights.select("token", "weight"))
    split = F.col("id") % TRAIN_MOD == TEST_REMAINDER
    rows = labeled.filter(split if test_split else ~split)
    keys = ["id", "label"] if with_label else ["id"]
    occ = rows.select(*keys, F.explode_outer("toks").alias("token"))
    return (
        occ.join(w, "token", "left")
        .groupBy(*keys)
        .agg(
            F.sum(F.coalesce(F.col("weight"), F.lit(0).cast("bigint")))
            .cast("bigint").alias("score")
        )
        .select(*keys, "score")
    )


def score_docs(labeled: DataFrame,
               weights: DataFrame | None = None) -> DataFrame:
    """Score the test split: (id, label, score). See _split_scores.

    Pass ``weights`` to share one trained table across scoring and
    threshold calibration."""
    if weights is None:
        weights = token_weights(labeled)
    return _split_scores(labeled, weights, test_split=True,
                         with_label=True)


def train_scores(labeled: DataFrame, weights: DataFrame) -> DataFrame:
    """(id, score) over the TRAIN split — the same _split_scores plan
    score_docs uses, so calibration can never diverge from scoring."""
    return _split_scores(labeled, weights, test_split=False,
                         with_label=False)


# "No negatives in train" sentinel: a threshold below every possible
# score, so everything is predicted positive.
_T_FLOOR = -(1 << 62)


def calibrated_threshold(labeled: DataFrame,
                         weights: DataFrame) -> DataFrame:
    """1-row (t): the k-th smallest train-split score, k = number of
    train negatives — i.e. the cut that reproduces the train class
    prior (`score > t` predicts positive at the training positive
    rate). Without it, `score > 0` is miscalibrated whenever classes
    are imbalanced: on the 90%-positive synthetic corpus it predicted
    negative for half the positives (held-out accuracy 0.56 vs 0.81
    calibrated).

    Exact and scale-shaped: scores are per-DOC integers, so the
    quantile is exact via groupBy(score).count() + one cumulative
    window over the DISTINCT score values (far fewer rows than docs;
    the classic exact-median-at-scale plan) — never a global
    row_number over the doc table. k = 0 coalesces to a floor
    sentinel (everything positive)."""
    k = labeled.filter(
        F.col("id") % TRAIN_MOD != TEST_REMAINDER
    ).agg(
        F.sum(F.when(F.col("label"), 0).otherwise(1))
        .cast("bigint").alias("k")
    )
    dist = train_scores(labeled, weights).groupBy("score").agg(
        F.count("*").cast("bigint").alias("c"))
    cum = dist.withColumn(
        "cum", F.sum("c").over(Window.orderBy("score")))
    return (
        cum.crossJoin(F.broadcast(k))
        .agg(
            F.min(
                F.when((F.col("k") > 0) & (F.col("cum") >= F.col("k")),
                       F.col("score"))
            ).alias("t")
        )
        .select(F.coalesce(F.col("t"),
                           F.lit(_T_FLOOR).cast("bigint")).alias("t"))
    )


def score_against(docs: DataFrame, weights: DataFrame,
                  id_col: str, text_col: str,
                  threshold: int = 0) -> DataFrame:
    """Score arbitrary documents with an already-trained weights table
    (the deployment shape: weights + calibrated threshold persisted by
    `classifier-train --out`, corpus at scale): (id, score, pred with
    pred = score > threshold). Same explode -> broadcast vocab join ->
    per-doc exact BIGINT aggregate plan as _split_scores; no-vocab
    docs restore to score 0.

    ``threshold`` should be the train-time calibrated cut
    (``calibrated_threshold``, persisted in the weights store's
    ``_params`` sidecar by ``save_model``) — the raw ``score > 0``
    cut is miscalibrated under class imbalance (see
    calibrated_threshold's docstring)."""
    toks = T.tokens(text_col, "spark")
    base = docs.select(F.col(id_col).alias("id"),
                       F.expr(toks).alias("toks"))
    scores = (
        base.select("id", F.explode("toks").alias("token"))
        .join(F.broadcast(weights.select("token", "weight")),
              "token", "inner")
        .groupBy("id")
        .agg(F.sum("weight").cast("bigint").alias("score"))
    )
    return (
        base.select("id")
        .join(scores, "id", "left")
        .select("id",
                F.coalesce(F.col("score"),
                           F.lit(0).cast("bigint")).alias("score"))
        .withColumn("pred",
                    (F.col("score") > F.lit(threshold)).cast("int"))
    )


def save_model(labeled: DataFrame, out_path: str) -> int:
    """Persist the deployable model: the full weight table as parquet
    at ``out_path`` plus the prior-calibrated threshold in the same
    directory's ``_params`` sidecar (the repo's store-parameter
    pattern — parameters travel WITH the artifact, no out-of-band
    handoff). Returns the threshold."""
    from distributed_computing_projects_spark.operators import storemeta

    weights = token_weights(labeled)
    weights.write.mode("error").parquet(out_path)
    t = int(calibrated_threshold(labeled, weights).collect()[0]["t"])
    storemeta.write_params(out_path, "quality_classifier",
                           {"threshold": t,
                            "train_mod": TRAIN_MOD,
                            "test_remainder": TEST_REMAINDER,
                            "min_df": MIN_DF})
    return t


def load_threshold(weights_path: str) -> int:
    """The calibrated threshold from a save_model directory's sidecar;
    falls back to 0 (the uncalibrated cut) for a bare weights parquet,
    matching pre-sidecar artifacts."""
    from distributed_computing_projects_spark.operators import storemeta

    meta = storemeta.read_params(weights_path)
    if meta is None or "threshold" not in meta:
        return 0
    return int(meta["threshold"])


def confusion(labeled: DataFrame) -> DataFrame:
    """Held-out confusion matrix: (label, pred, n), all integers;
    pred = score > the prior-calibrated threshold."""
    weights = token_weights(labeled)
    scored = score_docs(labeled, weights)
    t = calibrated_threshold(labeled, weights)
    return (
        scored.crossJoin(F.broadcast(t))
        .select(
            F.col("label").cast("int").alias("label"),
            (F.col("score") > F.col("t")).cast("int").alias("pred"),
        )
        .groupBy("label", "pred")
        .agg(F.count("*").alias("n"))
    )
