"""Salted-join tests: identical results to the plain join on skewed
data, and the salt actually spreads the hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from distributed_computing_projects_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one giant key (0) + a long tail
    big = spark.createDataFrame(
        [Row(k=0, v=i) for i in range(5000)]
        + [Row(k=i % 50 + 1, v=i) for i in range(1000)]
    )
    small = spark.createDataFrame([Row(k=i, name=f"dim{i}") for i in range(40)])
    return big, small


def test_salted_inner_join_equals_plain_join(spark, skewed):
    big, small = skewed
    plain = {(r.k, r.v, r.name) for r in big.join(small, ["k"]).collect()}
    salted = {(r.k, r.v, r.name) for r in salted_join(big, small, ["k"]).collect()}
    assert salted == plain and len(plain) == 5000 + sum(
        1 for i in range(1000) if i % 50 + 1 < 40
    )


def test_salted_left_join_keeps_unmatched_rows(spark, skewed):
    big, small = skewed
    plain = {(r.k, r.v, r.name) for r in big.join(small, ["k"], "left").collect()}
    salted = {(r.k, r.v, r.name)
              for r in salted_join(big, small, ["k"], how="left").collect()}
    assert salted == plain
    assert any(name is None for _, _, name in salted)  # tail keys 40..50 unmatched


def test_salt_spreads_hot_key(spark, skewed):
    big, _ = skewed
    salts = (
        big.filter(F.col("k") == 0)
        .withColumn("_salt", F.pmod(F.hash(F.struct(*big.columns)), F.lit(8)))
        .groupBy("_salt").count().collect()
    )
    assert len(salts) == 8  # hot key occupies every salt bucket
    assert max(r["count"] for r in salts) < 5000  # no single bucket owns it


def test_salted_join_rejects_replication_unsafe_modes(skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        salted_join(big, small, ["k"], how="right")


def test_salt_spreads_fully_duplicated_rows(spark):
    """The canonical hot key is N IDENTICAL rows — content-only hashing
    would give them all one salt and spread nothing."""
    big = spark.createDataFrame([Row(k=0, v=1)] * 4000).repartition(4)
    salts = (
        big.withColumn(
            "_salt",
            F.pmod(F.hash(F.struct(*big.columns), F.monotonically_increasing_id()),
                   F.lit(8)),
        )
        .groupBy("_salt").count().collect()
    )
    assert len(salts) == 8
    assert max(r["count"] for r in salts) < 4000
