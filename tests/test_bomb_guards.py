"""Decompression-bomb guards: one hostile member/stream whose plain
size exceeds the per-member bound must DROP (record-granularly, like
a torn member), never expand unbounded toward executor OOM. Caps are
monkeypatched small so the tests stay fast; the contract under test
is the drop, not the production constant."""

from __future__ import annotations

import bz2
import gzip
import zlib

from distributed_computing_projects_spark.sources import pdf as P14
from distributed_computing_projects_spark.sources import pdfobj as PO
from distributed_computing_projects_spark.sources import warc as W
from distributed_computing_projects_spark.sources import wikidump as WD

BOMB_PLAIN = b"\x00" * (1 << 20)  # 1 MiB of zeros, ~1 KiB compressed
CAP = 1 << 16  # 64 KiB test cap


def test_gunzip_members_drops_bomb_keeps_prior(monkeypatch):
    monkeypatch.setattr(W, "MAX_MEMBER_BYTES", CAP)
    ok = W.build_response_record("https://a/1", b"x" * 40)
    whole = gzip.compress(ok, mtime=0) + gzip.compress(BOMB_PLAIN, mtime=0)
    assert W.gunzip_members(whole) == ok  # bomb member dropped
    assert W.gunzip_members(gzip.compress(BOMB_PLAIN, mtime=0)) is None


def test_bunzip_members_drops_bomb_keeps_prior(monkeypatch):
    monkeypatch.setattr(WD, "MAX_MEMBER_BYTES", CAP)
    ok = b"<page>fine</page>"
    whole = bz2.compress(ok, 9) + bz2.compress(BOMB_PLAIN, 9)
    assert WD.bunzip_members(whole) == ok
    assert WD.bunzip_members(bz2.compress(BOMB_PLAIN, 9)) is None


def test_pdfobj_flate_bomb_drops_stream(monkeypatch):
    monkeypatch.setattr(PO, "MAX_STREAM_BYTES", CAP)
    bomb = zlib.compress(BOMB_PLAIN, 9)
    assert PO._inflate_bounded(bomb) is None
    small = zlib.compress(b"ok" * 10, 9)
    assert PO._inflate_bounded(small) == b"ok" * 10
    # in-document: a bomb CONTENT stream yields no text, document keeps
    raw = bytes(range(33, 97))
    good = PO.extract_facts(PO.build_pdf_objstm(raw, True))
    monkeypatch.setattr(PO, "MAX_STREAM_BYTES", 8)  # below content size
    f = PO.extract_facts(PO.build_pdf_objstm(raw, True))
    assert f is None or f["n_chars"] < good["n_chars"]


def test_pdf14_flate_bomb_drops_stream_keeps_rest(monkeypatch):
    monkeypatch.setattr(P14, "MAX_STREAM_BYTES", CAP)
    raw = bytes(range(33, 97))
    b = P14.build_pdf(raw, flate=True)
    # splice a bomb as an extra stream object before the real ones
    bomb_body = zlib.compress(BOMB_PLAIN, 9)
    bomb_obj = (b"9 0 obj << /Length %d /Filter /FlateDecode >>\nstream\n"
                % len(bomb_body) + bomb_body + b"\nendstream\nendobj\n")
    at = b.index(b"4 0 obj")
    spliced = b[:at] + bomb_obj + b[at:]
    got = P14.extract_text(spliced)
    assert got is not None
    n_streams, n_flate, n_ops, text = got
    assert text == raw  # both real streams survive, bomb dropped
    assert n_streams == 3 and n_flate == 3


def test_mutation_fuzz_never_raises():
    """Seeded mutation fuzz over every payload codec: random flips,
    truncations, and splices must parse or drop — never raise out of
    the (would-be) Arrow worker. The full 3000-case sweep ran at
    review time; this seeded 240-case slice guards regressions."""
    import gzip
    import random

    rng = random.Random(0xDCB)
    text = bytes(range(32, 96))
    info = W.build_record(
        "warcinfo", {"Content-Type": "application/warc-fields"},
        b"software: x\r\n")
    targets = [
        (PO.extract_facts, PO.build_pdf_objstm(text, True)),
        (PO.extract_facts, PO.build_pdf_tounicode(text, False)),
        (P14.extract_text, P14.build_pdf(text, True)),
        (W.parse_records, info + W.build_response_record("https://a/1",
                                                         b"b" * 40)),
        (lambda b: W.gunzip_members(b),
         gzip.compress(info, mtime=0)
         + gzip.compress(W.build_conversion_record("https://a/1",
                                                   b"t" * 40), mtime=0)),
        (WD.extract_dump, WD.build_dump([(0, "T", 0, "hello"),
                                         (1, "Talk:T", 1, "t")])),
    ]
    for fn, base in targets:
        for _ in range(40):
            b = bytearray(base)
            mode = rng.randrange(3)
            if mode == 0:
                for _ in range(rng.randrange(1, 5)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            elif mode == 1:
                b = b[: rng.randrange(len(b))]
            else:
                at = rng.randrange(len(b))
                b = (b[:at]
                     + bytes(rng.randrange(256)
                             for _ in range(rng.randrange(1, 24)))
                     + b[at:])
            fn(bytes(b))  # must not raise; value unchecked
