"""Multimodal column convention + decode/feature plumbing.

Convention (SURVEY.md §1.3 / BASELINE.json): an opaque ``binary``
payload column plus a typed metadata struct
(mime/width/height/duration). The decode / feature-extraction step is
the one place Python enters: an Arrow-batched ``mapInPandas`` whose
batch shape, schema, and partitioning are real and tested. The actual
media decode is STUBBED (no image/audio libs in this container):
``decode_features`` computes deterministic byte-level features, and
``decode_image`` raises ``NotImplementedError`` with the integration
point documented.

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


def decode_image(payloads: DataFrame) -> DataFrame:
    """Real image decode (resize / pixel stats) — STUB.

    The container has no imaging libraries; integrate by replacing the
    body with a ``mapInPandas`` that PIL-opens ``payload`` and emits
    (id, width, height, mean_rgb array<double>). The Spark-side
    contract (binary in, fixed-schema Arrow batches out) is exactly
    ``decode_features``'s.
    """
    raise NotImplementedError(
        "media decode requires imaging libraries not present in this "
        "environment; see decode_features for the working plumbing"
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
