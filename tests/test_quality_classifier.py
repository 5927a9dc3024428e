"""Unit semantics of the trained quality classifier: weight signs,
split discipline, no-vocab score restoration, int64 exactness."""

from __future__ import annotations

from pyspark.sql import Row

from distributed_computing_projects_spark.operators import (
    quality_classifier as QC,
)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t)
                                  for i, t in rows])


def test_weight_sign_tracks_rate_difference(spark):
    # 'good' appears only in positive-labeled docs, 'bad' only in the
    # negative (short) doc -> weights must be positive resp. negative.
    pos_text = " ".join(f"good w{i}" for i in range(30))  # 60 toks, distinct-rich
    neg_text = " ".join(["bad"] * 6)                      # short AND repetitive
    rows = [(i, pos_text) for i in range(1, 10)] + [(11, neg_text),
                                                    (12, neg_text),
                                                    (13, neg_text),
                                                    (14, neg_text)]
    labeled = QC.labeled_docs(_docs(spark, rows), "doc_id", "text")
    w = {r["token"]: r["weight"]
         for r in QC.token_weights(labeled).collect()}
    assert w["good"] > 0
    assert w["bad"] < 0


def test_test_split_never_trains(spark):
    # A token occurring ONLY in test-split docs (doc_id % 5 == 0) must
    # not enter the vocabulary.
    leak = " ".join(["leak"] * 30)
    keep = " ".join(f"tok{i}" for i in range(30))
    rows = [(5, leak), (10, leak), (15, leak), (20, leak), (25, leak)]
    rows += [(i, keep) for i in range(1, 5)]
    labeled = QC.labeled_docs(_docs(spark, rows), "doc_id", "text")
    vocab = {r["token"] for r in QC.token_weights(labeled).collect()}
    assert "leak" not in vocab


def test_no_vocab_doc_scores_zero(spark):
    # A test-split doc whose tokens all miss the vocabulary must appear
    # in the scored output with score exactly 0 (the join-back).
    trained = " ".join(f"t{i % 10}" for i in range(40))
    rows = [(i, trained) for i in range(1, 9)]
    rows.append((10, "unseen tokens only here"))  # test split, no vocab hit
    labeled = QC.labeled_docs(_docs(spark, rows), "doc_id", "text")
    scored = {r["id"]: r["score"] for r in QC.score_docs(labeled).collect()}
    assert scored[10] == 0


def test_confusion_counts_cover_the_test_split(spark):
    docs = _docs(spark, [(i, f"doc {i} " + " ".join(
        f"w{j}" for j in range(25))) for i in range(1, 41)])
    labeled = QC.labeled_docs(docs, "doc_id", "text")
    n_test = labeled.filter(f"id % {QC.TRAIN_MOD} = {QC.TEST_REMAINDER}") \
                    .count()
    total = sum(r["n"] for r in QC.confusion(labeled).collect())
    assert total == n_test


def test_calibrated_threshold_is_kth_smallest_train_score(spark):
    # Corpus with enough signal-free noise that scores vary; check the
    # threshold equals the k-th smallest train score computed directly.
    rows = [(i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(30)))
            for i in range(1, 30)]
    rows += [(31, "x x x"), (32, "y y y"), (33, "z z z")]  # negatives
    labeled = QC.labeled_docs(_docs(spark, rows), "doc_id", "text")
    w = QC.token_weights(labeled)
    t = QC.calibrated_threshold(labeled, w).collect()[0]["t"]
    scores = sorted(r["score"]
                    for r in QC.train_scores(labeled, w).collect())
    k = labeled.filter(
        f"id % {QC.TRAIN_MOD} <> {QC.TEST_REMAINDER} AND NOT label"
    ).count()
    assert k > 0 and t == scores[k - 1]


def test_threshold_floor_when_no_train_negatives(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(30)))
            for i in range(1, 20)]  # all pass the gate
    labeled = QC.labeled_docs(_docs(spark, rows), "doc_id", "text")
    w = QC.token_weights(labeled)
    t = QC.calibrated_threshold(labeled, w).collect()[0]["t"]
    assert t == QC._T_FLOOR
    # and therefore every held-out doc is predicted positive
    preds = {r["pred"] for r in QC.confusion(labeled).collect()}
    assert preds == {1}
