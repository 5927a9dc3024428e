"""XLSX source (sources/xlsx.py): A1 reference math, shared/inline/
rich-text string indirection, sparse-row cell placement, Excel serial
date recovery, bomb/torn/junk drops, and the Spark read path."""

from __future__ import annotations

import pytest

import distributed_computing_projects_spark.sources.ziparchive as ZA
import distributed_computing_projects_spark.sources.xlsx as XL
from distributed_computing_projects_spark.sources.xlsx import (
    _parse_shared_strings,
    _parse_sheet,
    build_xlsx,
    col_index,
    iter_sheet_rows,
    read_xlsx,
    ts_to_serial,
)

ROWS = [
    [1, "alpha", 2.5, True, ts_to_serial(86400)],
    [2, None, -3.25, False, ts_to_serial(1_700_000_000)],
    [3, "a shared string value", 0.0, None, None],
    [4, "a shared string value", 1e6, True, ts_to_serial(0)],
]
HDR = ["id", "name", "val", "flag", "ts"]


def _members(data):
    return dict(ZA.iter_zip_members(data))


def test_col_index_math():
    assert col_index("A1") == 0
    assert col_index("Z9") == 25
    assert col_index("AA1") == 26
    assert col_index("BC23") == 54
    assert col_index("123") is None


def test_roundtrip_types_and_sparse_placement():
    got = iter_sheet_rows(build_xlsx(HDR, ROWS))
    assert len(got) == len(ROWS)
    for want, g in zip(ROWS, got):
        for c, v in enumerate(want):
            if v is None:
                assert c not in g  # omitted cell, not shifted
            elif isinstance(v, (bool, str)):
                assert g[c] == v
            else:
                assert abs(g[c] - float(v)) < 1e-9
    # row 2's name cell is absent: val/flag must still land at 2/3
    assert got[1][2] == -3.25 and got[1][3] is False


def test_shared_and_inline_strings_both_used():
    members = _members(build_xlsx(HDR, ROWS))
    sst = members["xl/sharedStrings.xml"].decode()
    sheet = members["xl/worksheets/sheet1.xml"].decode()
    assert "a shared string value" in sst  # deduped: appears once
    assert sst.count("a shared string value") == 1
    assert 't="inlineStr"' in sheet and 't="s"' in sheet


def test_rich_text_runs_concatenate():
    sst = (b'<?xml version="1.0"?><sst xmlns="http://schemas.'
           b'openxmlformats.org/spreadsheetml/2006/main">'
           b"<si><r><t>left-</t></r><r><t>right</t></r></si>"
           b"<si><t>plain</t></si></sst>")
    assert _parse_shared_strings(sst) == ["left-right", "plain"]


def test_serial_dates_recover_exact_seconds():
    import pandas as pd

    from distributed_computing_projects_spark.sources.xlsx import (
        rows_from_binary,  # noqa: F401  (adapter logic under test)
    )

    secs = [0, 86_400, 1_700_000_000, 4_102_444_800]  # through 2100
    serials = pd.Series([ts_to_serial(s) for s in secs])
    back = ((serials - 25569.0) * 86400.0).round()
    assert list(back.astype("int64")) == secs


def test_dangling_shared_index_nulls_cell():
    data = build_xlsx(HDR, [[1, "only", 2.0, True, None]])
    members = _members(data)
    # drop the shared table: t="s" cells null, the rest survive
    keep = [(n, b) for n, b in members.items()
            if n != "xl/sharedStrings.xml"]
    got = iter_sheet_rows(ZA.build_zip(keep))
    # header cells are inline (short strings): row still parses
    assert got is not None and got[0][0] == 1.0


_SHEET_NS = (b'<worksheet xmlns="http://schemas.openxmlformats.org/'
             b'spreadsheetml/2006/main">')


def test_negative_shared_index_nulls_cell():
    # Python negative indexing must NOT wrap to the last shared string
    sheet = (b'<?xml version="1.0"?>' + _SHEET_NS +
             b'<sheetData><row r="1">'
             b'<c r="A1" t="s"><v>-1</v></c>'
             b'<c r="B1"><v>7</v></c>'
             b"</row></sheetData></worksheet>")
    got = _parse_sheet(sheet, ["zero", "last"])
    assert got == [{1: 7.0}]  # A1 nulls (absent), not "last"


def test_inline_rich_text_runs_concatenate():
    # spec-legal Excel output: <is> with multiple <r><t> runs must
    # concatenate like the shared-strings path, not keep the last run
    sheet = (b'<?xml version="1.0"?>' + _SHEET_NS +
             b'<sheetData><row r="1">'
             b'<c r="A1" t="inlineStr"><is>'
             b"<r><t>foo</t></r><r><t>bar</t></r>"
             b"</is></c></row></sheetData></worksheet>")
    got = _parse_sheet(sheet, [])
    assert got == [{0: "foobar"}]


def test_torn_sheet_keeps_completed_rows():
    members = _members(build_xlsx(HDR, ROWS))
    sheet = members["xl/worksheets/sheet1.xml"]
    shared = _parse_shared_strings(members["xl/sharedStrings.xml"])
    cut = sheet.rfind(b"<row")
    kept = _parse_sheet(sheet[:cut], shared)
    assert 1 <= len(kept) < len(ROWS) + 1


def test_cell_bomb_drops_whole_payload(monkeypatch):
    monkeypatch.setattr(XL, "MAX_CELLS", 8)
    assert iter_sheet_rows(build_xlsx(HDR, ROWS)) is None
    monkeypatch.setattr(XL, "MAX_CELLS", 1 << 24)
    assert iter_sheet_rows(build_xlsx(HDR, ROWS)) is not None


def test_junk_and_sheetless_drop():
    assert iter_sheet_rows(b"not a zip") is None
    assert iter_sheet_rows(ZA.build_zip([("a.txt", b"x")])) is None


def test_spark_read_path(spark, tmp_path):
    (tmp_path / "a.xlsx").write_bytes(build_xlsx(HDR, ROWS[:2]))
    (tmp_path / "b.xlsx").write_bytes(build_xlsx(HDR, ROWS[2:]))
    (tmp_path / "junk.xlsx").write_bytes(b"garbage")
    df = read_xlsx(
        spark, str(tmp_path),
        "id bigint, name string, val double, flag boolean, "
        "ts timestamp_ntz")
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 4
    assert rows[2].name is None and rows[2].val == -3.25
    assert rows[1].flag is True
    assert str(rows[1].ts) == "1970-01-02 00:00:00"
    assert rows[3].ts is None


def test_cells_without_r_follow_previous_cell():
    """Spec: a <c> without an r attribute occupies the column after
    the previous cell — even when earlier cells stored nothing."""
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (f'<?xml version="1.0"?><worksheet xmlns="{ns}">'
             '<sheetData><row r="1">'
             '<c r="C1"><v>3.0</v></c>'   # explicit C
             "<c><v>4.0</v></c>"          # positional -> D
             "<c><v>5.0</v></c>"          # positional -> E
             '</row></sheetData></worksheet>').encode()
    rows = _parse_sheet(sheet, [])
    assert rows == [{2: 3.0, 3: 4.0, 4: 5.0}]


def test_landing_paginates_workbooks(spark, sf_dir):
    """Excel caps a sheet at 1,048,576 rows and an unpaginated
    multi-million-row sheet's XML exceeds the zip member bound (the
    100x SCALE run caught a silent rows=0): the fixture stage must
    split workbooks at rows_per_book."""
    import os

    from distributed_computing_projects_spark.queries.ext_pipeline import (
        _build_xlsx_landing,
    )

    _, landing = _build_xlsx_landing(spark, sf_dir, "xlsx_page_test",
                                     rows_per_book=100)
    books = [f for f in os.listdir(landing) if f != "junk.xlsx"]
    n = spark.read.json(os.path.join(landing, "..", "stage")) \
        if False else None
    assert len(books) > 4  # paginated well past one-per-shard
    ddl = ("event_id bigint, user_id bigint, event_type string, "
           "value double, ts timestamp_ntz")
    total = read_xlsx(spark, landing, ddl).count()
    import duckdb

    want = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/events.parquet'").fetchone()[0]
    assert total == want
