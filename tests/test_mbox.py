"""MBOX / email extraction (sources/mbox.py): framing + unstuffing,
MIME tree walk, transfer-encoding and RFC 2047 round-trips,
message-granular drops, torn-tail behavior, and the Spark stages."""

from __future__ import annotations

import pytest

import distributed_computing_projects_spark.sources.mbox as MB
from distributed_computing_projects_spark.sources.mbox import (
    build_email,
    build_mbox,
    extract_message,
    iter_mbox_messages,
)

TEXT = ("body line one\nFrom the start of a line\n"
        ">From already-stuffed\n>>From doubly\nlast")


def _msg(i, cte="base64", html=None):
    return build_email(f"<{i}@corpus.example.com>", f"Doc {i} – report",
                       "corpus-web@example.com", TEXT, cte=cte,
                       html=html, boundary=f"----=fixture-{i}")


@pytest.mark.parametrize("cte", ["base64", "quoted-printable", "7bit"])
def test_transfer_encodings_roundtrip(cte):
    text = "plain ascii = body, with specials !"
    rec = extract_message(build_email("<1@x.com>", "s", "f@x.com",
                                      text, cte=cte))
    assert rec["text"] == text + "\n"


def test_mbox_framing_and_unstuffing_roundtrip():
    box = build_mbox([_msg(1), _msg(2, cte="quoted-printable")])
    msgs = iter_mbox_messages(box)
    assert len(msgs) == 2
    for i, m in enumerate(msgs, 1):
        rec = extract_message(m)
        assert rec["text"] == TEXT + "\n"
        assert rec["msg_id"] == f"<{i}@corpus.example.com>"


def test_rfc2047_subject_decodes():
    m = _msg(3)
    assert b"=?utf-8?" in m.lower()  # really encoded on the wire
    assert extract_message(m)["subject"] == "Doc 3 – report"


def test_html_sibling_is_not_the_text_of_record():
    rec = extract_message(_msg(4, html="DECOY html"))
    assert "DECOY" not in rec["text"]
    assert rec["text"] == TEXT + "\n"


def test_message_granular_drops():
    html_only = (b"From: x@example.com\r\n"
                 b"Message-ID: <d@example.com>\r\n"
                 b"Content-Type: text/html\r\n\r\n<p>x</p>\r\n")
    no_id = b"From: x@example.com\r\n\r\nbody\r\n"
    assert extract_message(html_only) is None
    assert extract_message(no_id) is None
    box = build_mbox([html_only, _msg(5), no_id])
    recs = [extract_message(m) for m in iter_mbox_messages(box)]
    assert [r is not None for r in recs] == [False, True, False]


def test_non_mbox_payload_drops_row():
    assert iter_mbox_messages(b"Delivered-To: not mbox framed") is None
    assert iter_mbox_messages(b"") is None


def test_torn_final_message_drops_message_granularly():
    box = build_mbox([_msg(6), _msg(7)])
    torn = box[: box.rfind(b"From fixture") + 60]
    msgs = iter_mbox_messages(torn)
    recs = [extract_message(m) for m in msgs]
    kept = [r for r in recs if r is not None]
    assert len(kept) == 1 and kept[0]["msg_id"] == "<6@corpus.example.com>"


def test_body_bomb_drops_message(monkeypatch):
    monkeypatch.setattr(MB, "MAX_BODY_BYTES", 16)
    assert extract_message(_msg(8)) is None


def test_charset_honored():
    m = build_email("<9@x.com>", "s", "f@x.com", "café déjà",
                    cte="quoted-printable")
    assert extract_message(m)["text"] == "café déjà\n"


def test_spark_stages(spark):
    from distributed_computing_projects_spark.sources.mbox import (
        extract_emails,
        mbox_payloads,
    )

    df = spark.createDataFrame(
        [(1, "alpha body", "web"), (2, "beta body", "books")],
        "doc_id bigint, text string, source string")
    rows = {r.id: r for r in extract_emails(
        mbox_payloads(df, "doc_id", "text", "source")).collect()}
    assert rows[1].extracted == "alpha body\n"
    assert rows[1].subject == "Doc 1 – report"
    assert rows[2].sender == "corpus-books@example.com"
    assert len(rows) == 2  # the html-only dud messages dropped
