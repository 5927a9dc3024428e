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
    # r17: at test scale the edge set is under MAX_DRIVER_EDGES, so
    # the RETURNED frame is the driver union-find's local relation (0
    # exchanges; the LSH pair computation runs eagerly at build time).
    # The distributed star path keeps its shape — pinned by the
    # forced-path tests in test_extensions.py, not by this plan count.
    "dedup_clusters": 0,
    "dedup_incremental": 3,
    "dedup_minhash_lsh": 4,
    # assignment is a baked codegen argmin (0 exchanges); the 3 are the
    # cell self-join's two hash-rows + the drop-set distinct (the flag
    # join back broadcasts)
    "dedup_semantic": 3,
    # two-level assignment is spread's fixture-scale repartition + ONE
    # argmin exchange (stage-1 probe expr and stage-2 cell join are
    # exchange-free: baked expression + broadcast; the vector rides
    # through the argmin agg so there is no join back), then the cell
    # self-join's two hash-rows + drop-set distinct + final sort
    "dedup_semantic_twolevel": 6,
    "dedup_simhash": 3,
    # both: spread's fixture-scale repartition, then the zip-of-XML
    # build+extract chain is chained mapInPandas — in-partition
    "docx_extract_text": 1,
    "epub_extract_text": 1,
    "events_hourly": 1,
    # r16 optimization: 12 -> 8, summing exactly as the printed plan
    # shows (r16 ADVICE asked for arithmetic that reaches 8): pairs
    # distinct on (u,i) x3 — the canonical copy plus one per union
    # side of the persisted edge table, plan-duplicated but runtime-
    # REUSED — + hashpartitioning(src) x2 (degree agg + the ed build
    # join's edge side) + dest agg x3 (one per round; round 1 folds
    # the uniform rank constant so NO rank join exists, and rounds
    # 2..3's rank joins are node-sized BROADCASTS, not shuffles).
    # The final top-k is TakeOrderedAndProject + a 20-row window —
    # no exchange. At cluster scale the edge table would be bucketed
    # by src so the per-round join side stops re-shuffling
    "graph_pagerank_topk": 8,
    "grep": 0,
    # the RETURNED plan is binaryFile scan -> Arrow line walk ->
    # from_json filter: zero exchanges — per-FILE parallelism is the
    # whole model (non-splittable shards, like gzip); the fixture
    # build's repartition+write is an eager side stage, not the plan
    "jsonl_zst_scan": 0,
    # ONE exchange: the split-table repartition (one task per frame
    # range — the intra-file parallelism that is the whole point);
    # decode + from_json are narrow on top of it
    "jsonl_zst_seekable_scan": 1,
    "knn_join_topk": 2,
    # 2 of 5 are data-sized (the grams-side join input + the per-doc
    # agg); the model tables (uni x2 via the cached explode, bi) are
    # vocab-sized, and the final rank window is 1-row-per-doc
    "lm_perplexity_rank": 5,
    "multimodal_jpeg_decode": 1,
    "multimodal_video_frame_sample": 1,
    "pack_documents": 1,
    # both: spread's fixture-scale repartition before the Arrow
    # build+extract chain (two chained mapInPandas, no exchange
    # between them)
    "pdf_extract_text": 1,
    # same spread-then-Arrow-chain shape as docx/epub: one exchange,
    # the fixture-scale repartition before build+extract
    "pptx_extract_text": 1,
    # same spread-then-Arrow-chain shape as pdf_extract_text: the one
    # exchange is spread's fixture-scale repartition; the object-model
    # walk (objstm/xref-stream) and CMap mapping are in-partition
    "pdf_filters_extract_text": 1,
    "pdf_objstm_extract_text": 1,
    "pdf_tounicode_extract_text": 1,
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
    # binaryFile scan -> Arrow b-tree page walk: zero exchanges —
    # per-FILE parallelism is the whole model (SQLite files are a
    # page-pointer forest, not splittable; the tfrecord/bson shape)
    "sqlite_events_scan": 0,
    # the lakehouse triad reads are ONE native parquet FileScan over
    # the log/manifest/timeline-resolved file list: delta's partition
    # values attach via a BROADCAST map-join (a BroadcastExchange,
    # which this pin's regex rightly does not count as a shuffle);
    # iceberg/hudi data files carry their columns, so the plan is the
    # bare pruned scan
    "delta_table_scan": 0,
    # DV scan adds a broadcast LeftAnti on (file, _metadata
    # .row_index) over the same single FileScan — still no shuffle
    "delta_dv_table_scan": 0,
    "iceberg_table_scan": 0,
    # position deletes add a broadcast chain (delete parquet ->
    # seq-rule filter -> LeftAnti on (file, row_index)) over the
    # same single data FileScan — still no shuffle
    "iceberg_pos_delete_scan": 0,
    "hudi_table_scan": 0,
    # MOR merge: base FileScan union executor-decoded log upserts,
    # then ONE window over the record key — the single shuffle a MOR
    # snapshot read inherently pays (compaction's job to remove)
    "hudi_mor_snapshot_scan": 1,
    # distinct on (grp,h) + the window re-key to grp, both hash-rows
    "sketch_distinct_tokens": 2,
    # binaryFile scan -> Arrow frame walk + Example decode -> cast
    # projection: zero exchanges — per-FILE parallelism is the whole
    # model (the jsonl_zst_scan shape); the fixture build's
    # repartition+write is an eager side stage, not the plan
    "tfrecord_scan": 0,
    "tfidf_top_terms": 4,
    "training_corpus_summary": 3,
    # the wire stage adds ONE exchange (spread's fixture-scale
    # repartition before the Arrow build+extract chain); HTML strip
    # and gates are codegen projections, then the same dedup window +
    # chunk agg as the summary pipeline
    "training_corpus_wire": 4,
    # spread repartition before the WAT build+record-walk chain; the
    # JVM JSON stage (from_json + explode + id parse) is narrow
    "wat_extract_links": 1,
    "warc_gz_extract_responses": 1,
    "warc_zst_extract_responses": 1,
    # protect -> strip chain -> restore are all narrow (two Arrow
    # stages + a codegen projection straight over the scan): ZERO
    # exchanges — the scan's own partitioning is the parallelism
    "wikidump_nowiki_plain_text": 0,
    # spread repartition before the dump build+extract chain; the
    # wikitext strip is a codegen projection on the extractor output
    "wikidump_plain_text": 1,
    "wine_filter_agg": 2,
    "wordcount": 2,
    # the single per-bucket aggregate; the Morton key is codegen
    "zorder_layout_quality": 1,
}


@pytest.fixture(scope="module", autouse=True)
def _cold_cache_at_module_start(spark):
    # Budgets are pinned under this FILE's own execution order: a
    # persist registered by a test in some OTHER file (e.g. the matrix
    # rotation suite) swaps a subtree for an InMemoryRelation and moves
    # a query's Exchange count. Clearing once at module start makes the
    # in-suite plans identical to a standalone run of this file;
    # clearing per test would instead break the pins that depend on
    # persists registered by earlier queries in this same module.
    spark.catalog.clearCache()
    yield


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
