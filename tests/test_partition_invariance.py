"""Results must not depend on the physical partitioning: the same
query at different shuffle-partition counts (and input repartitionings)
must produce identical values. This is the determinism contract the
numeric discipline (decimal sums, integer outputs, explicit
tie-breaks) exists to guarantee — a 1000-executor cluster picks
different partition counts than local[4], and the answers must not
move. One representative query per shape class."""

from __future__ import annotations

import pytest

QUERIES = [
    "q1_pricing_summary",        # decimal-sum aggregation
    "repetition_stats",          # explode + two hash aggregates
    "dedup_minhash_lsh",         # banded self-join + distinct
    "knn_join_topk",             # bucket join + rank window
    "vocab_coverage",            # top-k slice + cumulative window
    "wordcount",                 # classic shuffle agg
]


def _rows(df):
    return sorted(
        tuple(round(v, 9) if isinstance(v, float) else v for v in r)
        for r in df.collect()
    )


@pytest.mark.parametrize("name", QUERIES)
def test_partition_count_does_not_change_values(spark, sf_dir, name):
    from distributed_computing_projects_spark.queries import load_registry

    fn = load_registry()[name].fn
    key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(key)
    try:
        spark.conf.set(key, "2")
        spark.catalog.clearCache()
        at2 = _rows(fn(spark, sf_dir))
        spark.conf.set(key, "17")
        spark.catalog.clearCache()
        at17 = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set(key, saved)
        spark.catalog.clearCache()
    assert at2 == at17, f"{name} values moved with partition count"


FILE_SOURCE_QUERIES = [
    "jsonl_zst_scan",        # binaryFile + bounded line walker
    "webdataset_scan",       # tar-shard sample walk
    "avro_events_roundtrip",  # OCF block walk + binary decode
]


@pytest.mark.parametrize("name", FILE_SOURCE_QUERIES)
def test_file_grouping_does_not_change_values(spark, sf_dir, name):
    """The r13 file-walk sources must be invariant to how binaryFile
    groups shards into partitions — a 1000-executor scan packs files
    differently than local[4], and per-file decode means the answer
    cannot depend on the packing."""
    from distributed_computing_projects_spark.queries import load_registry

    fn = load_registry()[name].fn
    key = "spark.sql.files.maxPartitionBytes"
    saved = spark.conf.get(key)
    try:
        spark.conf.set(key, str(1 << 14))  # every file its own split
        at_small = _rows(fn(spark, sf_dir))
        spark.conf.set(key, str(1 << 30))  # everything packs together
        at_large = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set(key, saved)
    assert at_small == at_large and len(at_small) > 0
