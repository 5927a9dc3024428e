from distributed_computing_projects_spark.catalog import Catalog
from distributed_computing_projects_spark.sources import load_table


def test_put_get_ls_store_delete(spark, sf_dir, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    region = load_table(spark, sf_dir, "region")
    cat.put("region", region)

    assert cat.store() == ["region"]
    got = cat.get("region")
    assert got.count() == region.count()
    assert got.columns == region.columns

    files = cat.ls("region")
    assert files and all(f["bytes"] > 0 for f in files)

    cat.put("region", region.limit(2), mode="overwrite")
    assert cat.get("region").count() == 2

    cat.delete("region")
    assert cat.store() == []


def test_put_refuses_silent_overwrite(spark, sf_dir, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat2"))
    nation = load_table(spark, sf_dir, "nation")
    cat.put("nation", nation)
    try:
        cat.put("nation", nation)
        raised = False
    except FileExistsError:
        raised = True
    assert raised


def test_put_rejects_unknown_mode(spark, sf_dir, tmp_path):
    """A typo'd mode ('append') must raise, not silently overwrite —
    round-1 advisor finding."""
    cat = Catalog(spark, str(tmp_path / "cat3"))
    nation = load_table(spark, sf_dir, "nation")
    cat.put("nation", nation)
    try:
        cat.put("nation", nation, mode="append")
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_put_get_roundtrip_every_format(spark, sf_dir, tmp_path):
    """Format is remembered on disk (part-file extensions); get() is
    format-agnostic and rows round-trip exactly in all formats."""
    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path / "cat4"))
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    want = sorted(map(tuple, nation.collect()))
    for fmt in Catalog.FORMATS:
        cat.put(f"nation_{fmt}", nation, fmt=fmt)
        got = cat.get(f"nation_{fmt}")
        # JSON re-infers types; compare on a stable cast
        got = got.select(
            F.col("n_nationkey").cast("bigint"), "n_name",
            F.col("n_regionkey").cast("bigint"),
        )
        assert sorted(map(tuple, got.collect())) == want


def test_put_rejects_unknown_format(spark, sf_dir, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat5"))
    nation = load_table(spark, sf_dir, "nation")
    try:
        cat.put("nation", nation, fmt="avro")
        raised = False
    except ValueError:
        raised = True
    assert raised
