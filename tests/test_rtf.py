"""RTF source (sources/rtf.py): the control-word walk — destination
skipping, \\uN/\\ucN fallback protocol, code-page escapes, \\binN raw
skip, group nesting, torn streams — plus the Spark stage and CLI."""

from __future__ import annotations

import pytest

import distributed_computing_projects_spark.sources.rtf as RT
from distributed_computing_projects_spark.sources.rtf import (
    build_rtf,
    extract_rtf_text,
)

PARAS = ["hello world plain ascii paragraph",
         "accented: café résumé naïve — dash",
         "unicode: 你好 ☃ snowman",
         "tabs\tand\nline breaks inside one para"]


def test_roundtrip_all_escape_forms():
    assert extract_rtf_text(build_rtf(PARAS)) == "\n".join(PARAS)


def test_builder_deterministic_and_escapes_split():
    data = build_rtf(PARAS)
    assert data == build_rtf(PARAS)
    # cp1252-range chars took \'hh, astral/CJK took \uN
    assert b"\\'e9" in data  # é
    assert b"\\u20320 ?" in data or b"\\u20320?" in data  # 你
    assert b"\\u9731?" in data.replace(b" ", b"")  # ☃


def test_decoys_never_leak():
    got = extract_rtf_text(build_rtf(PARAS))
    for decoy in ("DECOY", "fldinst", "decoy.example",
                  "0123456789abcdef", "Times New Roman"):
        assert decoy not in got


def test_magic_and_empty_drop():
    assert extract_rtf_text(b"plain text, not rtf") is None
    assert extract_rtf_text(b"{\\rtf1\\ansi}") is None


def test_uc_fallback_protocol():
    # \uc2: TWO fallback chars swallow after each \uN, including
    # \'hh escapes which count as one char each
    doc = (rb"{\rtf1\ansi\uc2 a\u233 xyb\uc1\u233\'e9c\par}")
    # uc=2 swallows "xy" after the first \uN; the \'e9 counts as the
    # single uc=1 fallback char after the second
    assert extract_rtf_text(doc) == "aébéc"
    # negative \uN wraps per the signed-16-bit convention
    doc = rb"{\rtf1\uc0 \u-10179\u-9089 ok\par}"
    got = extract_rtf_text(doc)
    # surrogate pair + "ok" (the space is the token delimiter)
    assert got.endswith("ok") and len(got) == 4


def test_bin_skips_raw_bytes_with_braces():
    doc = b"{\\rtf1 keep\\bin6 }}}{{{after\\par}"
    assert extract_rtf_text(doc) == "keepafter"


def test_unknown_star_destination_skips_known_keeps():
    doc = (rb"{\rtf1 a{\*\futurething {nested} gone}b"
           rb"{\field{\*\fldinst GONE}{\fldrslt shown}}c\par}")
    assert extract_rtf_text(doc) == "ab shownc".replace("  ", " ") \
        or extract_rtf_text(doc) == "abshownc"


def test_formatting_words_transparent():
    doc = rb"{\rtf1 {\b\fs48\cf1 big}{\i small}\par}"
    assert extract_rtf_text(doc) == "bigsmall"


def test_crlf_stream_wrapping_is_not_text():
    doc = b"{\\rtf1 one\r\ntwo\nthree\\par}"
    assert extract_rtf_text(doc) == "onetwothree"


def test_torn_stream_keeps_partial():
    data = build_rtf(PARAS)
    cut = data.rfind(b"\\par")
    got = extract_rtf_text(data[:cut])
    assert got is not None and got.startswith(PARAS[0])


def test_nesting_bomb_bound(monkeypatch):
    monkeypatch.setattr(RT, "_MAX_DEPTH", 8)
    doc = b"{\\rtf1 x" + b"{" * 50 + b"y" + b"}" * 50 + b"\\par}"
    assert extract_rtf_text(doc) == "x"


def test_output_bomb_bound(monkeypatch):
    monkeypatch.setattr(RT, "MAX_TEXT_CHARS", 10)
    got = extract_rtf_text(b"{\\rtf1 " + b"a" * 100 + b"\\par}")
    assert got is not None and len(got) <= 100


def test_ansicpg_codepage_applies():
    # cp1251 (Cyrillic): 0xE0 is U+0430
    doc = rb"{\rtf1\ansi\ansicpg1251 \'e0\par}"
    assert extract_rtf_text(doc) == "а"


def test_spark_stage(spark):
    from distributed_computing_projects_spark.sources.rtf import (
        extract_rtf,
        rtf_payloads,
    )

    df = spark.createDataFrame(
        [(1, "x" * 100), (2, "short café")],
        "doc_id bigint, text string")
    out = {r.id: r.extracted
           for r in extract_rtf(
               rtf_payloads(df, "doc_id", "text",
                            para_chars=40)).collect()}
    assert out[1] == "\n".join(["x" * 40, "x" * 40, "x" * 20])
    assert out[2] == "short café"


def test_cli_rtf_text(spark, tmp_path, capsys):
    from distributed_computing_projects_spark.cli import main

    (tmp_path / "doc.rtf").write_bytes(build_rtf(["cli rtf body"]))
    assert main(["rtf-text", str(tmp_path)], spark=spark) == 0
    assert "cli rtf body" in capsys.readouterr().out
