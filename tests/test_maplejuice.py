"""MapleJuice API tests — native tier and exec-compat tier.

The exec tier uses tiny Python scripts as stand-ins for the reference's
compiled maple/juice binaries (same stdin/stdout contracts:
mp3/src/maplejuice.go:342-355, :655-669)."""

import textwrap
from collections import Counter

from distributed_computing_projects_spark.operators import (
    juice,
    juice_exec,
    maple,
    maple_exec,
)


def make_wc_fns():
    # Defined inside a factory so cloudpickle serializes them by value
    # (module-level test functions aren't importable on executors).
    def wc_maple(line):
        for w in line.split():
            yield w, "1"

    def wc_juice(key, values):
        return str(sum(int(v) for v in values if v.lstrip("-").isdigit()))

    return wc_maple, wc_juice


wc_maple, wc_juice = make_wc_fns()


def test_native_wordcount(spark):
    df = spark.createDataFrame([("a b a",), ("b c",)], "line string")
    kv = maple(df, wc_maple, num_tasks=2)
    out = {r["key"]: r["value"] for r in juice(kv, wc_juice, num_juices=2).collect()}
    assert out == {"a": "2", "b": "2", "c": "1"}


def test_native_range_partition(spark):
    df = spark.createDataFrame([("a b a",), ("b c d e",)], "line string")
    kv = maple(df, wc_maple)
    out = juice(kv, wc_juice, num_juices=2, partition="range").collect()
    assert [r["key"] for r in out] == sorted(r["key"] for r in out)


def test_native_juice_skips_non_numeric_like_reference(spark):
    # mp3/src/juice/wordcount.go:10-13 skips values that fail Atoi.
    df = spark.createDataFrame(
        [("k", "1"), ("k", "x"), ("k", "2")], "key string, value string"
    )
    out = juice(df, wc_juice).collect()
    assert out[0]["value"] == "3"


def test_exec_tier_wordcount(spark, tmp_path):
    mapper = tmp_path / "mapper.py"
    mapper.write_text(textwrap.dedent("""\
        #!/usr/bin/env python3
        import sys
        for line in sys.stdin:
            for w in line.split():
                print(f"{w},1")
        """))
    mapper.chmod(0o755)
    reducer = tmp_path / "reducer.py"
    reducer.write_text(textwrap.dedent("""\
        #!/usr/bin/env python3
        import sys
        key = sys.argv[1]
        total = sum(int(v) for v in sys.stdin.read().split())
        print(f"{key}\\t{total}")
        """))
    reducer.chmod(0o755)

    df = spark.createDataFrame([("a b a",), ("b c",)], "line string")
    kv = maple_exec(df, f"python3 {mapper}")
    out = {r["key"]: r["value"] for r in juice_exec(kv, f"python3 {reducer}").collect()}
    assert out == {"a": "2", "b": "2", "c": "1"}


def test_exec_maple_comma_truncation_contract(spark, tmp_path):
    # The reference keeps fields [0],[1] of "k,v,extra" and drops short
    # lines (mp3/src/maplejuice.go:347-355).
    mapper = tmp_path / "echo.py"
    mapper.write_text("import sys\n[print(l.rstrip('\\n')) for l in sys.stdin]\n")
    df = spark.createDataFrame([("k,v,extra",), ("noseparator",)], "line string")
    out = maple_exec(df, f"python3 {mapper}").collect()
    assert [(r["key"], r["value"]) for r in out] == [("k", "v")]


def test_native_wordcount_matches_python_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    kv = maple(docs.select("text"), wc_maple)
    got = {r["key"]: int(r["value"]) for r in juice(kv, wc_juice).collect()}
    want = Counter()
    for r in docs.select("text").collect():
        want.update(r["text"].split())
    assert got == dict(want)


def test_juice_tree_matches_juice_on_hot_key(spark):
    """The reference's own shuffle stress is 5M identical values for ONE
    key (mp3/src/juice/generateMockMap.py); juice_tree combines
    per-partition so the hot key never materializes as one list."""
    from pyspark.sql import functions as F

    from distributed_computing_projects_spark.operators.maplejuice import (
        juice,
        juice_tree,
    )

    n = 200_000
    kv = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 100 == 0, F.lit("cold")).otherwise(F.lit("hot")).alias("key"),
            F.lit("1").alias("value"),
        )
        .repartition(8)
    )

    def add(key, values):
        return str(sum(int(v) for v in values))

    tree = {(r.key, r.value) for r in juice_tree(kv, add).collect()}
    flat = {(r.key, r.value) for r in juice(kv, add).collect()}
    assert tree == flat == {("hot", str(n - n // 100)), ("cold", str(n // 100))}
