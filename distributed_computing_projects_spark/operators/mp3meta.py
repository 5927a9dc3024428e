"""MP3 stream METADATA scan in pure stdlib — the honest library-free
slice of lossy audio: the frame-header layer (ISO/IEC 11172-3 §2.4.1)
is integer end-to-end, so frame counts, bitrate, sample rate, and
duration are exactly recomputable, while the decode proper (Huffman
spectral data -> requantization -> IMDCT -> polyphase synthesis) has
float stages no two engines reproduce bit-for-bit and stays the
documented external-codec integration point (multimodal.decode_audio
covers WAV and lossless FLAC).

Why it earns its place in a 100 TB pipeline: audio ingest triages on
exactly this metadata — duration/bitrate filters, corrupt-stream
drops, CBR/VBR routing — BEFORE paying decode cost for the survivors,
the same sample-before-decode discipline as operators/video.py.

Scope: MPEG-1/2/2.5 Layers I/II/III frame headers (sync walk,
bitrate/sample-rate tables, padding, CRC-16 skip), leading ID3v2 tags
(syncsafe size skip) and trailing ID3v1 tags. "Free format"
(bitrate index 0) and reserved indices are outside the subset. A
non-MP3 payload returns ``None`` (drops the row); a stream torn
mid-frame keeps the complete frames before it (frame-granular
malformed-record policy, like flac.py/gif.py).

The fixture builder emits headers + deterministic filler bytes — no
encoder pretense; the scanner is what is under test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_computing_projects_spark.operators.spread import spread

# bitrate tables in kbps, indexed [1..14] (0 = free format: outside
# subset; 15 = reserved). Keyed by (version_group, layer) where
# version_group is "1" for MPEG-1 and "2" for MPEG-2/2.5.
_BITRATES = {
    ("1", 1): [32, 64, 96, 128, 160, 192, 224, 256,
               288, 320, 352, 384, 416, 448],
    ("1", 2): [32, 48, 56, 64, 80, 96, 112, 128,
               160, 192, 224, 256, 320, 384],
    ("1", 3): [32, 40, 48, 56, 64, 80, 96, 112,
               128, 160, 192, 224, 256, 320],
    ("2", 1): [32, 48, 56, 64, 80, 96, 112, 128,
               144, 160, 176, 192, 224, 256],
    ("2", 2): [8, 16, 24, 32, 40, 48, 56, 64,
               80, 96, 112, 128, 144, 160],
    ("2", 3): [8, 16, 24, 32, 40, 48, 56, 64,
               80, 96, 112, 128, 144, 160],
}

# sample rates indexed [0..2], by version bits (3=MPEG1, 2=MPEG2,
# 0=MPEG2.5); index 3 is reserved
_SAMPLE_RATES = {3: [44100, 48000, 32000],
                 2: [22050, 24000, 16000],
                 0: [11025, 12000, 8000]}

# samples per frame by (version_group, layer)
_SAMPLES = {("1", 1): 384, ("1", 2): 1152, ("1", 3): 1152,
            ("2", 1): 384, ("2", 2): 1152, ("2", 3): 576}


def _frame_at(b: bytes, pos: int):
    """Parse a frame header at ``pos``; returns (frame_size_bytes,
    bitrate_kbps, sample_rate, samples_per_frame) or None if the
    four bytes there are not a valid in-subset header."""
    if pos + 4 > len(b) or b[pos] != 0xFF or (b[pos + 1] & 0xE0) != 0xE0:
        return None
    version = (b[pos + 1] >> 3) & 0x3     # 3=MPEG1 2=MPEG2 0=MPEG2.5
    layer_bits = (b[pos + 1] >> 1) & 0x3  # 3=I 2=II 1=III
    if version == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits
    vgroup = "1" if version == 3 else "2"
    br_idx = (b[pos + 2] >> 4) & 0xF
    sr_idx = (b[pos + 2] >> 2) & 0x3
    padding = (b[pos + 2] >> 1) & 0x1
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free format / reserved: outside subset
    bitrate = _BITRATES[(vgroup, layer)][br_idx - 1]
    sr = _SAMPLE_RATES[version][sr_idx]
    if layer == 1:
        size = (12 * bitrate * 1000 // sr + padding) * 4
    else:
        per = _SAMPLES[(vgroup, layer)]
        size = per // 8 * bitrate * 1000 // sr + padding
    return size, bitrate, sr, _SAMPLES[(vgroup, layer)]


def parse_mp3_frames(b: bytes):
    """Walk an MP3 stream: skip a leading ID3v2 tag (syncsafe size),
    parse consecutive frame headers, stop at a trailing ID3v1 tag or
    the first byte run that is not a valid frame (keeping the frames
    before it). Returns ``(n_frames, bitrate_kbps, sample_rate,
    duration_ms)`` — bitrate is the constant CBR rate, or -1 when
    frames disagree (VBR) — or ``None`` when no frame parses (the
    row-level malformed drop)."""
    pos = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) \
            | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        pos = 10 + size
    n = 0
    bitrate = None
    vbr = False
    sr = None
    samples = 0
    while pos < len(b):
        if b[pos:pos + 3] == b"TAG":  # ID3v1 trailer
            break
        hdr = _frame_at(b, pos)
        if hdr is None:
            break
        size, br, rate, per = hdr
        if pos + size > len(b):
            break  # torn final frame: keep the complete ones
        if sr is None:
            sr = rate
        elif rate != sr:
            break  # sample-rate switch: not one stream
        if bitrate is None:
            bitrate = br
        elif br != bitrate:
            vbr = True
        n += 1
        samples += per
        pos += size
    if n == 0 or sr is None:
        return None
    return n, (-1 if vbr else bitrate), sr, samples * 1000 // sr


# fixture geometry: byte0 picks the bitrate index, byte1 the frame
# count, byte2 the sample-rate index, byte3 the padding bit — enough
# text bytes to pin all four header dimensions from character codes
MP3_META_BYTES = 4


def mp3_payloads(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, payload): a deterministic MPEG-1 Layer III CBR stream per
    row — ``1 + byte1 % 7`` frames at bitrate index ``1 + byte0 % 14``
    and sample-rate index ``byte2 % 3``, padding bit ``byte3 % 2`` on
    every frame, wrapped in an ID3v2 tag (13 syncsafe body bytes) and
    an ID3v1 trailer so both skip paths always run. Frame bodies are
    0xAA filler — the scanner never reads them, which is the point."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for i, text in zip(pdf["id"], pdf["text"]):
                raw = text.encode("utf-8")[:MP3_META_BYTES]
                if len(raw) < MP3_META_BYTES:
                    continue
                br_idx = 1 + raw[0] % 14
                n_frames = 1 + raw[1] % 7
                sr_idx = raw[2] % 3
                padding = raw[3] % 2
                hdr = bytes([
                    0xFF,
                    0xE0 | (3 << 3) | (1 << 1) | 1,  # MPEG1, L3, no CRC
                    (br_idx << 4) | (sr_idx << 2) | (padding << 1),
                    0x00,
                ])
                size, _br, _sr, _per = _frame_at(hdr, 0)
                frame = hdr + b"\xaa" * (size - 4)
                payloads.append(
                    b"ID3\x04\x00\x00" + b"\x00\x00\x00\x0d"
                    + b"\x00" * 13
                    + frame * n_frames
                    + b"TAG" + b"\x00" * 125
                )
                ids.append(i)
            yield pd.DataFrame({"id": ids, "payload": payloads})

    cols = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )
    return spread(cols).mapInPandas(_encode, schema="id bigint, payload binary")


MP3_META_SCHEMA = (
    "id bigint, n_frames int, bitrate_kbps int, sample_rate int,"
    " duration_ms bigint"
)


def mp3_stream_stats(payloads: DataFrame) -> DataFrame:
    """Per-payload MP3 stream metadata via :func:`parse_mp3_frames`
    inside one Arrow ``mapInPandas`` — the decode-free triage stage.
    Undecodable payloads drop the row."""

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("id", "n_frames", "bitrate_kbps",
                                   "sample_rate", "duration_ms")}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                parsed = parse_mp3_frames(bytes(payload))
                if parsed is None:
                    continue
                n, br, sr, ms = parsed
                out["id"].append(i)
                out["n_frames"].append(n)
                out["bitrate_kbps"].append(br)
                out["sample_rate"].append(sr)
                out["duration_ms"].append(ms)
            yield pd.DataFrame(out)

    return payloads.select("id", "payload").mapInPandas(
        _scan, schema=MP3_META_SCHEMA
    )
