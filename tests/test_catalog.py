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
