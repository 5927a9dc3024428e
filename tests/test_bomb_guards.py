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
    from distributed_computing_projects_spark.functions import (
        brotlilib as B,
        webplib as WP,
        zstdlib as Z,
    )
    from distributed_computing_projects_spark.operators import (
        multimodal as MM,
    )

    targets = [
        (PO.extract_facts, PO.build_pdf_objstm(text, True)),
        (PO.extract_facts, PO.build_pdf_tounicode(text, False)),
        *[(PO.extract_facts, PO.build_pdf_filters(text, v))
          for v in range(PO.FILTER_VARIANTS)],
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
    # r13 codec seams: mutated frames must drop (None), never raise
    if Z.available():
        targets.append(
            (lambda b: W.unzstd_members(b), Z.compress(text * 8)))
    if B.available():
        targets.append(
            (lambda b: B.decompress(b, 1 << 20), B.compress(text * 8)))
        targets.append(
            (lambda b: W.decode_content_encoding(
                b"Content-Encoding: gzip, br", b),
             W.encode_http_body(text * 8, "gzip, br")))
    if WP.available():
        targets.append(
            (MM._decode_webp,
             WP.encode_lossless_rgb(bytes(range(48)), 4, 4)))
    from distributed_computing_projects_spark.functions import (
        heiflib as HL,
    )
    if HL.available() and HL.encoder_available(HL.COMPRESSION_AV1):
        targets.append(
            (MM._decode_heif,
             HL.encode_lossless_rgb(bytes(range(48)), 4, 4)))
    # r13b seams: avro/webdataset walks are no-raise by contract;
    # the compressed-line walker likewise; snappy raises ValueError
    # by design (callers translate), so only ValueError is legal
    from distributed_computing_projects_spark.functions import (
        snappy as SN,
    )
    from distributed_computing_projects_spark.sources import (
        avro as AVS,
        webdataset as WDS,
    )
    from distributed_computing_projects_spark.sources.compressed import (
        decompressor_factory,
        iter_lines,
    )

    def _snappy_drop(b):
        try:
            SN.decompress(b, 1 << 20)
        except ValueError:
            pass

    avro_base = AVS.write_ocf(
        [{"a": i, "b": f"s{i}"} for i in range(40)],
        {"type": "record", "name": "R", "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"}]},
        codec="deflate", records_per_block=8)
    wds_base = WDS.build_shard(
        [(f"{i}", {"txt": b"t" * i}) for i in range(12)])
    from distributed_computing_projects_spark.sources import (
        ziparchive as ZAS,
    )
    zip_base = ZAS.build_zip(
        [(f"{i}.txt", b"m" * (i + 1)) for i in range(12)])
    targets.append((lambda b: list(AVS.iter_records(b)), avro_base))
    targets.append((lambda b: list(WDS.iter_samples(b)), wds_base))
    targets.append((lambda b: list(ZAS.iter_zip_members(b)), zip_base))
    targets.append((_snappy_drop, SN.compress(text * 8)))
    if Z.available():
        targets.append(
            (lambda b: list(iter_lines(b, decompressor_factory("x.zst"))),
             __import__("functools").reduce(
                 lambda acc, i: acc + Z.compress(text), range(3), b"")))
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


def test_multimodal_png_idat_bomb_and_torn_drop(monkeypatch):
    import numpy as np

    from distributed_computing_projects_spark.operators import (
        multimodal as MM,
    )

    rgb = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    good = MM.encode_png(rgb)
    assert MM._decode_png(good)[2].shape == (4, 4, 3)
    monkeypatch.setattr(MM, "MAX_DECODE_BYTES", CAP)
    # bomb: keep the valid 4x4 header, swap the IDAT body for a
    # stream that inflates past the cap — must DROP, not materialize
    at = good.index(b"IDAT") - 4
    end = good.index(b"IEND") - 4
    bomb_body = zlib.compress(BOMB_PLAIN, 9)
    import struct

    bomb_chunk = (struct.pack(">I", len(bomb_body)) + b"IDAT" + bomb_body
                  + struct.pack(">I", zlib.crc32(b"IDAT" + bomb_body)))
    assert MM._decode_png(good[:at] + bomb_chunk + good[end:]) is None
    # torn: truncate the IDAT zlib stream mid-way — partial inflate
    # must DROP (d.eof unchecked would pass garbage rows downstream)
    size = struct.unpack(">I", good[at:at + 4])[0]
    body = good[at + 8:at + 8 + size][:-3]
    torn_chunk = (struct.pack(">I", len(body)) + b"IDAT" + body
                  + struct.pack(">I", zlib.crc32(b"IDAT" + body)))
    assert MM._decode_png(good[:at] + torn_chunk + good[end:]) is None
    assert MM._decode_png(good) is not None  # cap leaves real PNGs alone


def test_multimodal_tiff_deflate_bomb_drops(monkeypatch):
    from tests.test_tiff import build_tiff

    from distributed_computing_projects_spark.operators import (
        multimodal as MM,
    )

    monkeypatch.setattr(MM, "MAX_DECODE_BYTES", CAP)
    px = bytes(range(48))  # 4x4 RGB
    ok = build_tiff(px, 4, 4, comp=8, packed=zlib.compress(px, 6))
    assert MM._decode_tiff(ok) is not None
    bomb = build_tiff(px, 4, 4, comp=8, packed=zlib.compress(BOMB_PLAIN, 9))
    assert MM._decode_tiff(bomb) is None
    # torn deflate strip: partial inflate must drop the image
    torn = build_tiff(px, 4, 4, comp=8, packed=zlib.compress(px, 6)[:-3])
    assert MM._decode_tiff(torn) is None


def test_multimodal_lzw_and_packbits_bombs(monkeypatch):
    from tests.test_tiff import packbits_encode, tiff_lzw_encode

    from distributed_computing_projects_spark.operators import (
        multimodal as MM,
    )

    monkeypatch.setattr(MM, "MAX_DECODE_BYTES", CAP)
    # LZW expands zeros massively from tiny input
    assert MM._tiff_lzw_decode(tiff_lzw_encode(BOMB_PLAIN)) is None
    assert MM._tiff_lzw_decode(tiff_lzw_encode(b"ok" * 32)) == b"ok" * 32
    assert MM._packbits_decode(packbits_encode(BOMB_PLAIN)) is None
    assert MM._packbits_decode(packbits_encode(b"ok" * 32)) == b"ok" * 32


def test_pdf_torn_flate_streams_drop_not_partial():
    """ADVICE r12: decompressobj returns a partial prefix on a torn
    stream without raising — both extractors must check d.eof and
    DROP, not count partial text."""
    raw = bytes(range(33, 97))
    b = P14.build_pdf(raw, flate=True)
    # tear the FIRST flate content stream a few bytes short
    body = zlib.compress(
        b"BT /F1 12 Tf (partial) Tj ET", 9)
    torn = body[:-4]
    obj = (b"9 0 obj << /Length %d /Filter /FlateDecode >>\nstream\n"
           % len(torn) + torn + b"\nendstream\nendobj\n")
    at = b.index(b"4 0 obj")
    got = P14.extract_text(b[:at] + obj + b[at:])
    assert got is not None
    n_streams, n_flate, n_ops, text = got
    assert text == raw  # torn stream contributed NOTHING
    # pdfobj: _inflate_bounded returns None on a torn stream
    assert PO._inflate_bounded(body) is not None
    assert PO._inflate_bounded(torn) is None
