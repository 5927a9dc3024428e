"""Deterministic sampling / splitting: the properties that matter are
STABILITY (membership is a function of id alone) and EXACTNESS of the
split partition — pinned on tiny frames with closed-form checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_computing_projects_spark.operators import sampling as SP
from distributed_computing_projects_spark.sources.registry import load_table


def test_sample_is_stable_across_partitionings(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id for r in
         SP.deterministic_sample(docs, "doc_id", 3000).select("doc_id").collect()}
    b = {r.doc_id for r in
         SP.deterministic_sample(docs.repartition(13), "doc_id", 3000)
         .select("doc_id").collect()}
    assert a == b and 0 < len(a) < docs.count()


def test_sample_nests_by_rate(spark, sf_dir):
    """The 10% sample must be a subset of the 30% sample (same salt):
    bucket < 1000 implies bucket < 3000 — lets a pipeline scale a
    sample up without resampling from scratch."""
    docs = load_table(spark, sf_dir, "documents")
    small = {r.doc_id for r in
             SP.deterministic_sample(docs, "doc_id", 1000).select("doc_id").collect()}
    big = {r.doc_id for r in
           SP.deterministic_sample(docs, "doc_id", 3000).select("doc_id").collect()}
    assert small <= big


def test_different_salts_draw_different_samples(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id for r in
         SP.deterministic_sample(docs, "doc_id", 5000, salt="s1")
         .select("doc_id").collect()}
    b = {r.doc_id for r in
         SP.deterministic_sample(docs, "doc_id", 5000, salt="s2")
         .select("doc_id").collect()}
    assert a != b


def test_split_assign_is_a_partition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = SP.split_assign(docs, "doc_id", {"train": 8000, "val": 1000,
                                           "test": 1000})
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()  # total, no overlap/loss
    assert counts["train"] > counts["val"]


def test_split_rejects_bad_weights(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        SP.split_assign(docs, "doc_id", {"train": 9000, "val": 500})


def test_stratified_rates_apply_per_stratum(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    kept = SP.stratified_sample(
        docs, "lang", "doc_id", {"zh": 10_000, "en": 0}, default_bp=5000
    )
    by_lang = {r.lang: r.n for r in
               kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    want_zh = docs.filter(F.col("lang") == "zh").count()
    assert by_lang.get("zh") == want_zh  # rate 10000 keeps everything
    assert "en" not in by_lang  # rate 0 keeps nothing


def test_sample_is_a_pushed_down_filter(spark, sf_dir):
    """No shuffle in the plan: sampling must stay a scan+filter."""
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        SP.deterministic_sample(docs, "doc_id", 2000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
