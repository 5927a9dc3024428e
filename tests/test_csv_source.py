"""CSV source / tab-KV sink tests: pin the reference's malformed-record
policy (multi-line quoted records silently dropped, SURVEY §7.3 #4) and
the wine query end-to-end on a real CSV fixture."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from distributed_computing_projects_spark.operators.wine import token_occurrence_agg
from distributed_computing_projects_spark.sources.csv import (
    WINE_SCHEMA,
    read_csv,
    write_tab_kv,
)

HEADER = ",country,description,designation,points,price,province,region_1,region_2,variety,winery"

ROWS = [
    '0,US,"juicy succulent succulent fruit",Res,87,12.0,CA,Napa,Napa Valley,Chardonnay,W1',
    '1,US,"plain oak notes",Res,85,10.0,CA,Napa,Napa Valley,Chardonnay,W2',
    '2,FR,"succulent cherry",Gr,90,30.0,Bx,Med,Left Bank,Pinot Noir,W3',
    # quoted MULTI-LINE description -> per-line parsing must drop it
    '3,US,"starts here',
    'ends here",Res,88,15.0,CA,Napa,Napa Valley,Chardonnay,W4',
    '4,US,"succulent pear",Res,86,11.0,CA,Napa,Napa Valley,Chardonnay,W5',
]


def _write_fixture(tmp_path):
    p = tmp_path / "wine.csv"
    p.write_text(HEADER + "\n" + "\n".join(ROWS) + "\n")
    return str(p)


def test_drop_mode_skips_multiline_record(spark, tmp_path):
    path = _write_fixture(tmp_path)
    df = read_csv(spark, path, WINE_SCHEMA, malformed="drop")
    ids = sorted(r.row_id for r in df.select("row_id").collect())
    # row 3 spans two physical lines; per-line parity parsing drops both
    # halves (the reference's exact behavior, wine_maple.go:10-13)
    assert ids == [0, 1, 2, 4]


def test_multiline_mode_recovers_quoted_newlines(spark, tmp_path):
    path = _write_fixture(tmp_path)
    df = read_csv(spark, path, WINE_SCHEMA, malformed="multiline")
    assert df.count() == 5
    desc = df.filter(F.col("row_id") == 3).collect()[0].description
    assert "starts here" in desc and "ends here" in desc


def test_wine_query_on_csv_counts_occurrences(spark, tmp_path):
    """F2+F3+F4+A1 on the CSV source: per-OCCURRENCE token counts
    (row 0 has 'succulent' twice -> counts 2, not 1)."""
    path = _write_fixture(tmp_path)
    wine = read_csv(spark, path, WINE_SCHEMA, malformed="drop")
    out = token_occurrence_agg(
        wine, F.col("variety") == "Chardonnay", "description",
        "succulent", "region_2",
    )
    assert {(r[0], r[1]) for r in out.collect()} == {("Napa Valley", 3)}


def test_tab_kv_sink_roundtrip(spark, tmp_path):
    kv = spark.createDataFrame(
        [("b", "2"), ("a", "1"), ("c", "3")], ["key", "value"]
    ).coalesce(1)
    out = str(tmp_path / "out")
    write_tab_kv(kv, out)
    [part] = glob.glob(f"{out}/part-*")
    assert open(part).read() == "a\t1\nb\t2\nc\t3\n"


def test_tab_kv_sink_writes_raw_bytes_not_csv_escapes(spark, tmp_path):
    """The reference emits raw key\\tvalue lines; quotes must not be
    escaped nor empty values rendered as quoted empties."""
    kv = spark.createDataFrame(
        [("q", 'he said "hi"'), ("e", ""), ("c", "a,b")], ["key", "value"]
    ).coalesce(1)
    out = str(tmp_path / "raw")
    write_tab_kv(kv, out)
    [part] = glob.glob(f"{out}/part-*")
    assert open(part).read() == 'c\ta,b\ne\t\nq\the said "hi"\n'
