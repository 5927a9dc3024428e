"""Shuffle budget per headline query, pinned: every Exchange in a
plan is a full network reshuffle at cluster scale, so an accidental
extra one (a lost broadcast hint, a dropped partitioning reuse, a
distinct added on a hot path) is a 100 TB performance regression even
when correctness stays green. Counts are the initial physical plan at
sf0.001 under the fixed test session (4 cores / 4 shuffle
partitions); intentional plan changes update the table in the same
commit, with the commit message saying why.

Budgets are EXACT, not upper bounds: a query that LOSES an exchange
also deserves a look (it usually means a broadcast got bigger or a
step silently collapsed)."""

from __future__ import annotations

import re

import pytest

EXCHANGE_BUDGET = {
    "ann_bruteforce_topk": 0,
    "boilerplate_ngrams": 1,
    "chunk_documents": 0,
    "condorcet_round1": 2,
    "dedup_clusters": 4,
    "dedup_incremental": 3,
    "dedup_minhash_lsh": 4,
    "dedup_simhash": 3,
    "events_hourly": 1,
    "grep": 0,
    "knn_join_topk": 2,
    "multimodal_jpeg_decode": 1,
    "multimodal_video_frame_sample": 1,
    "pack_documents": 1,
    "q17_small_quantity_revenue": 2,
    "q1_pricing_summary": 1,
    "q3_shipping_priority": 1,
    "q5_local_supplier_volume": 1,
    # 12 static nodes but only 3 data-sized (train token counts + the
    # two per-doc scoring aggregates); the rest are vocab-sized or
    # 1-row, and the duplicated weights subtree folds under
    # ReuseExchange at runtime (see operators/quality_classifier.py)
    "quality_classifier_confusion": 12,
    "range_join_clicks_before_purchase": 1,
    "repetition_stats": 2,
    # distinct on (grp,h) + the window re-key to grp, both hash-rows
    "sketch_distinct_tokens": 2,
    "tfidf_top_terms": 4,
    "training_corpus_summary": 3,
    "wine_filter_agg": 2,
    "wordcount": 2,
    # the single per-bucket aggregate; the Morton key is codegen
    "zorder_layout_quality": 1,
}


def test_budget_covers_every_headliner():
    from distributed_computing_projects_spark.queries import load_registry

    headliners = {n for n, s in load_registry().items() if s.headline}
    assert headliners == set(EXCHANGE_BUDGET), (
        "headline set changed — extend/trim EXCHANGE_BUDGET"
    )


@pytest.mark.parametrize("name", sorted(EXCHANGE_BUDGET))
def test_exchange_count_is_pinned(spark, sf_dir, name):
    from distributed_computing_projects_spark.plans.inspect import (
        physical_plan,
    )
    from distributed_computing_projects_spark.queries import load_registry

    plan = physical_plan(load_registry()[name].fn(spark, sf_dir))
    got = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert got == EXCHANGE_BUDGET[name], (
        f"{name}: {got} exchanges, budget {EXCHANGE_BUDGET[name]} — if "
        f"intentional, update EXCHANGE_BUDGET and say why in the commit"
    )
