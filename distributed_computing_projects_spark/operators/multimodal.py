"""Multimodal column convention + decode/feature plumbing.

Convention (SURVEY.md §1.3 / BASELINE.json): an opaque ``binary``
payload column plus a typed metadata struct
(mime/width/height/duration). The decode / feature-extraction step is
the one place Python enters: an Arrow-batched ``mapInPandas`` whose
batch shape, schema, and partitioning are real and tested.
``decode_features`` computes deterministic byte-level features;
``decode_image`` REALLY decodes the formats a library-free container
can (binary PPM / uncompressed 24-bit BMP, pure numpy) and drops the
rest — compressed codecs (JPEG/PNG/audio/video) remain the documented
external-library integration point.

At scale the payloads dominate: keep them in their own parquet column
(never in shuffle keys), size ``spark.sql.files.maxPartitionBytes`` to
the payload size, and push metadata filters down BEFORE the Python
stage so the Arrow transfer only carries surviving rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

PAYLOAD_SCHEMA = (
    "id bigint, payload binary,"
    " meta struct<mime: string, width: int, height: int, duration_s: double>"
)

FEATURE_SCHEMA = (
    "id bigint, n_bytes int, first_byte int, byte_checksum bigint, mime string"
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Demo payload table: UTF-8 bytes of the text as the opaque binary
    column (stands in for image/audio bytes), with typed metadata."""
    return df.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_s"),
        ).alias("meta"),
    )


def payload_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Pure-SQL metadata over payloads (no Python): byte length + mime.
    This is the filter stage that runs BEFORE any decode at scale."""
    p = attach_payload(df, id_col, text_col)
    return p.select(
        "id",
        F.octet_length("payload").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
    )


def decode_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The features are deterministic byte-level stand-ins (length, first
    byte, additive checksum) so the full plumbing — schema in/out,
    Arrow batches, per-partition iteration — is exercised and testable
    without media libraries. Swap ``_featurize`` for a real decoder
    (PIL/torchaudio/ffmpeg) keeping the same signature.
    """

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": payload.map(len).astype("int32"),
                    "first_byte": payload.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "byte_checksum": payload.map(
                        lambda b: sum(b) % 2_147_483_647
                    ).astype("int64"),
                    "mime": pdf["mime"],
                }
            )

    cols = payloads.select(
        "id", "payload", F.col("meta.mime").alias("mime")
    )
    return cols.mapInPandas(_featurize, schema=FEATURE_SCHEMA)


IMAGE_SCHEMA = (
    "id bigint, width int, height int, n_px bigint,"
    " sum_r bigint, sum_g bigint, sum_b bigint"
)


def _decode_ppm(b: bytes):
    """Binary PPM (P6): 'P6' <ws> width <ws> height <ws> maxval <ws-1>
    raw RGB. Handles arbitrary whitespace and '#' comments in the
    header. Returns (w, h, HxWx3 uint8 array) or None."""
    import numpy as np

    if not b.startswith(b"P6"):
        return None
    i, tokens = 2, []
    while len(tokens) < 3 and i < len(b):
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        tokens.append(b[i:j])
        i = j
    i += 1  # the single whitespace byte after maxval
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if maxval != 255 or w <= 0 or h <= 0 or len(b) < i + w * h * 3:
        return None
    px = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i)
    return w, h, px.reshape(h, w, 3)


def _decode_bmp(b: bytes):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up rows,
    4-byte row padding, BGR order). Returns (w, h, HxWx3 RGB uint8
    array) or None."""
    import struct

    import numpy as np

    if len(b) < 54 or not b.startswith(b"BM"):
        return None
    off = struct.unpack_from("<I", b, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", b, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", b, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    flipped = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    if len(b) < off + row_bytes * h:
        return None
    rows = np.frombuffer(b, dtype=np.uint8, count=row_bytes * h,
                         offset=off).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if flipped:
        bgr = bgr[::-1]
    return w, h, bgr[..., ::-1]  # BGR -> RGB


def decode_image(payloads: DataFrame) -> DataFrame:
    """REAL image decode for the formats a library-free container can
    decode: binary PPM (P6) and uncompressed 24-bit BMP, parsed with
    numpy inside an Arrow-batched ``mapInPandas`` (same contract as
    ``decode_features``: binary in, fixed-schema batches out). Emits
    (id, width, height, n_px, per-channel byte SUMS) — integer outputs,
    so a differential oracle can check the decode exactly; means are
    the caller's divide.

    Undecodable payloads (wrong magic, truncated, compressed formats)
    are DROPPED — the engine's malformed-record policy (sources/csv.py)
    applied to media. JPEG/PNG/audio/video decode needs external
    libraries (PIL/ffmpeg — absent here); plug a codec in by extending
    the per-format dispatch below, keeping the same schema.
    """
    import numpy as np

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("id", "width", "height", "n_px",
                                   "sum_r", "sum_g", "sum_b")}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                b = bytes(payload)
                decoded = _decode_ppm(b) or _decode_bmp(b)
                if decoded is None:
                    continue
                w, h, px = decoded
                sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out["id"].append(i)
                out["width"].append(w)
                out["height"].append(h)
                out["n_px"].append(w * h)
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return payloads.select("id", "payload").mapInPandas(
        _decode, schema=IMAGE_SCHEMA
    )


FRAME_BYTES = 16


def frame_sample(
    payloads: DataFrame, frame_bytes: int = FRAME_BYTES, stride: int = 4
) -> DataFrame:
    """Frame sampling over binary payloads: (id, frame_no, frame) for
    every ``stride``-th fixed-size frame — the video-ingest sampling
    step's Spark-side plumbing, entirely JVM-side (sequence + explode +
    binary substring; NO Python — sampling needs only byte offsets, so
    the expensive Arrow hop is reserved for actual decode, which then
    runs on the sampled frames only, stride-times cheaper).

    Payload layout is the demo convention (contiguous fixed-size
    frames); a real container format would first demux via a
    decode_features-style mapInPandas and keep this sampling shape.
    Partial trailing frames are dropped (a real sampler's behavior).
    """
    if frame_bytes <= 0 or stride <= 0:
        raise ValueError("frame_bytes and stride must be positive")
    n_frames = F.floor(F.octet_length("payload") / frame_bytes)
    return (
        payloads.select("id", "payload")
        .withColumn("_n", n_frames)
        .filter(F.col("_n") > 0)
        .select(
            "id",
            "payload",
            F.explode(F.expr(f"sequence(0, _n - 1, {stride})"))
            .alias("frame_no"),
        )
        .select(
            "id",
            F.col("frame_no").cast("bigint").alias("frame_no"),
            F.expr(
                f"substring(payload, frame_no * {frame_bytes} + 1,"
                f" {frame_bytes})"
            ).alias("frame"),
        )
    )


AUDIO_SCHEMA = (
    "id bigint, sample_rate int, channels int, n_samples bigint,"
    " sum_amplitude bigint, peak_amplitude int"
)


def _decode_wav(b: bytes):
    """Uncompressed 16-bit PCM WAV (RIFF/WAVE, fmt tag 1): returns
    (sample_rate, channels, int16 sample array) or None. Walks the
    chunk list, so extra chunks (LIST/fact) before data are fine."""
    import struct

    import numpy as np

    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if len(body) < size:
            # truncated chunk: reject, matching the image decoders'
            # truncation handling (drop-malformed policy)
            return None
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_fmt, channels, rate, _br, _ba, bits = fmt
    if audio_fmt != 1 or bits != 16 or channels <= 0:
        return None
    n = len(data) // 2
    if n == 0:
        return None
    samples = np.frombuffer(data, dtype="<i2", count=n)
    return rate, channels, samples


def decode_audio(payloads: DataFrame) -> DataFrame:
    """REAL audio decode for the format a library-free container can
    decode: uncompressed 16-bit PCM WAV, parsed with numpy inside the
    same Arrow ``mapInPandas`` contract as :func:`decode_image`.
    Emits integer aggregates (sample count, amplitude sum, peak |amp|)
    so the decode is differentially checkable; undecodable payloads
    (other codecs, truncated, non-PCM) DROP. MP3/AAC/Opus need
    external codecs — the documented integration point, same as
    JPEG/PNG for images."""
    import numpy as np

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("id", "sample_rate", "channels",
                                   "n_samples", "sum_amplitude",
                                   "peak_amplitude")}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                decoded = _decode_wav(bytes(payload))
                if decoded is None:
                    continue
                rate, channels, samples = decoded
                out["id"].append(i)
                out["sample_rate"].append(rate)
                out["channels"].append(channels)
                out["n_samples"].append(len(samples))
                out["sum_amplitude"].append(
                    int(samples.sum(dtype=np.int64))
                )
                out["peak_amplitude"].append(
                    int(np.abs(samples.astype(np.int32)).max())
                )
            yield pd.DataFrame(out)

    return payloads.select("id", "payload").mapInPandas(
        _decode, schema=AUDIO_SCHEMA
    )
