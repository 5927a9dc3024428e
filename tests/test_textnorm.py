"""Unicode NFC normalization: composition semantics and the
cross-implementation agreement with DuckDB's utf8proc
(operators/textnorm.py). All non-ASCII fixture text is written as
explicit escapes — raw combining characters in source are invisible
and editor-fragile."""

from __future__ import annotations

import unicodedata

import duckdb

from distributed_computing_projects_spark.operators import textnorm as TN
from distributed_computing_projects_spark.queries.ext_text import (
    _NFC_SUFFIX,
)

DECOMPOSED_CAFE = "cafe\u0301"  # 5 code points
PRECOMPOSED_CAFE = "caf\u00e9"  # 4 code points
ANGSTROM = "A\u030angstro\u0308m"  # 10 code points -> 8


def test_fixture_is_genuinely_decomposed():
    assert unicodedata.normalize("NFC", _NFC_SUFFIX) != _NFC_SUFFIX
    assert len(unicodedata.normalize("NFC", _NFC_SUFFIX)) < len(
        _NFC_SUFFIX
    )


def test_nfc_normalize_composes_and_counts(spark):
    rows = [
        (1, DECOMPOSED_CAFE),
        (2, PRECOMPOSED_CAFE),  # idempotent
        (3, ANGSTROM),
        (4, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["id"]: (r["normalized"], r["n_chars_before"], r["n_chars_after"])
        for r in TN.nfc_normalize(df, "doc_id", "text").collect()
    }
    assert got[1] == (PRECOMPOSED_CAFE, 5, 4)
    assert got[2] == (PRECOMPOSED_CAFE, 4, 4)
    assert got[3] == ("\u00c5ngstr\u00f6m", 10, 8)
    assert got[4] == ("plain ascii", 11, 11)
    # every normalized string agrees with utf8proc, independently
    con = duckdb.connect()
    for i, text in rows:
        want = con.execute(
            "SELECT nfc_normalize(?)", [text]
        ).fetchone()[0]
        assert got[i][0] == want, (i, got[i][0], want)
