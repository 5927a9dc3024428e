"""Queries that run on the byte-coalesced sibling session
(``session.byte_coalesced``: AQE coalesces post-shuffle partitions by
advisory BYTES instead of keeping ~defaultParallelism KB-sized ones,
including inside persisted subplans). Membership is MEASURED, not
assumed — the r17 full-headliner sweep (4 alternating reps base vs
sibling at sf0.1/local[32], min-of-reps; OPTIMIZATION_r17.md carries
the full table):

- applied: the 33 headliners that sped up >= 1.08x (range 1.08-1.46x;
  e.g. dedup_clusters 1.44x, zorder 1.46x, wordcount 1.38x,
  q1 1.37x, lm_perplexity 1.34x, pagerank 1.31x), plus the
  non-headline twins that share those exact operators
  (wat_link_pagerank, dedup_survivors).
- NOT applied: condorcet_round1 (0.54x — its CPU-dense per-order
  aggregate collapses to one partition at bench scale; re-confirmed
  every round), q17_small_quantity_revenue (0.91x),
  warc_zst_extract_responses (0.92x), and the 18 neutral queries
  (0.94-1.07x — mostly per-row Arrow pipelines whose cost is inside
  mapInPandas, not exchanges).

Scale note: the sibling's conf is byte-driven, so at real data sizes
it yields MORE post-shuffle partitions, not one — this is the guide
§2.2 "fewer, larger reduce partitions" discipline, not a local[32]
tuning. The bench/base session itself stays untouched (canary and
cross-round comparisons stay like-for-like).
"""

from __future__ import annotations

BYTE_COALESCED_QUERIES = frozenset({
    "ann_bruteforce_topk",
    "boilerplate_ngrams",
    "dedup_clusters",
    "dedup_incremental",
    "dedup_minhash_lsh",
    "dedup_semantic",
    "dedup_semantic_twolevel",
    "dedup_simhash",
    "dedup_survivors",
    "delta_dv_table_scan",
    "docx_extract_text",
    "events_hourly",
    "graph_pagerank_topk",
    "grep",
    "hudi_mor_snapshot_scan",
    "hudi_table_scan",
    "iceberg_pos_delete_scan",
    "jsonl_zst_seekable_scan",
    "knn_join_topk",
    "lm_perplexity_rank",
    "pack_documents",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "quality_classifier_confusion",
    "range_join_clicks_before_purchase",
    "repetition_stats",
    "sketch_distinct_tokens",
    "tfidf_top_terms",
    "training_corpus_summary",
    "wat_link_pagerank",
    "wikidump_nowiki_plain_text",
    "wine_filter_agg",
    "wordcount",
    "zorder_layout_quality",
})
