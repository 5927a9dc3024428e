"""Bucketed co-located join tests: same-bucketed tables must join and
aggregate WITHOUT a shuffle exchange on the bucketed key. Broadcast is
disabled inside these tests — at test SF the dimension is broadcastable
and Spark rightly prefers that; the bucketing pay-off targets the scale
where NEITHER side broadcasts."""

from __future__ import annotations

import pytest

from distributed_computing_projects_spark.catalog import Catalog
from distributed_computing_projects_spark.plans.inspect import physical_plan
from distributed_computing_projects_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("cat")))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cat.put_bucketed("lineitem", li, ["l_orderkey"], n_buckets=8)
    cat.put_bucketed("orders", orders, ["o_orderkey"], n_buckets=8)
    return cat


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _no_shuffle(plan: str) -> bool:
    # \bExchange\b matches the shuffle node but not BroadcastExchange
    # (no word boundary after the 't')
    import re

    return not re.search(r"\bExchange\b", plan)


def test_cobucketed_join_has_no_shuffle(spark, bucketed, no_broadcast):
    li = bucketed.get_bucketed("lineitem")
    orders = bucketed.get_bucketed("orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    plan = physical_plan(joined)
    assert "SortMergeJoin" in plan
    assert _no_shuffle(plan), f"co-bucketed join must not shuffle:\n{plan}"
    assert joined.count() > 0


def test_bucketed_agg_on_bucket_key_has_no_shuffle(spark, bucketed):
    li = bucketed.get_bucketed("lineitem")
    plan = physical_plan(li.groupBy("l_orderkey").count())
    assert _no_shuffle(plan), f"bucketed agg must not shuffle:\n{plan}"


def test_unbucketed_join_does_shuffle(spark, sf_dir, no_broadcast):
    """Control: the same join on raw parquet shuffles both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    plan = physical_plan(li.join(orders, li.l_orderkey == orders.o_orderkey))
    assert not _no_shuffle(plan)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    li = bucketed.get_bucketed("lineitem")
    orders = bucketed.get_bucketed("orders")
    got = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    a = load_table(spark, sf_dir, "lineitem")
    b = load_table(spark, sf_dir, "orders")
    want = a.join(b, a.l_orderkey == b.o_orderkey).count()
    assert got == want


def test_partitioned_dataset_prunes_partitions(spark, sf_dir, tmp_path):
    """A filter on the partition column must become directory pruning
    (PartitionFilters), not a data filter over every file."""
    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path / "cat"))
    docs = load_table(spark, sf_dir, "documents")
    cat.put_partitioned("docs_by_lang", docs, ["lang"])
    part = cat.get("docs_by_lang").filter(F.col("lang") == "en")
    plan = physical_plan(part)
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters")[1].split("]")[0]
    assert part.count() == docs.filter(F.col("lang") == "en").count()
