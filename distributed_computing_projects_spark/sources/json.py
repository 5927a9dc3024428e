"""JSONL (newline-delimited JSON) source with the same malformed-record
policy as the CSV source — an engine extension (the reference's only
record format is the text line, mp3/src/maple/mapler.go:41-43; JSONL is
how event/log payloads actually land in a modern pipeline).

Policy parity with ``sources/csv.py``: parse each LINE independently,
DROP records that fail to parse. Per-line ``from_json`` (not the json
datasource) keeps the semantics split-invariant: a physical split
boundary can never change which records parse, because no record spans
lines. Drop policy covers SYNTACTIC failures (truncated objects, bare
garbage, non-object lines). A well-formed object whose field fails the
schema's type (``"value": "abc"`` for a double) keeps the record with
that field null — Spark's PERMISSIVE convention; callers needing
strictness filter on required columns.

Scale: the text scan splits like any line source (S2 delegated to
Spark split planning); ``from_json`` is a codegen'd JVM expression —
no Python in the parse path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    malformed: str = "drop",
) -> DataFrame:
    """Schema'd JSONL scan with an explicit malformed-record policy.

    ``malformed='drop'``: skip lines that don't parse as a JSON object
    (CSV-source parity). ``'fail'``: raise on first malformed line via
    FAILFAST. ``'keep'``: malformed lines survive with every schema
    column null plus the raw line in ``_corrupt_record`` — the
    quarantine pattern (route them to a dead-letter sink at scale
    instead of silently shrinking the input).
    """
    return parse_jsonl_lines(spark.read.text(path), schema, malformed)


def parse_jsonl_lines(
    lines: DataFrame,
    schema: StructType,
    malformed: str = "drop",
) -> DataFrame:
    """The parse stage of :func:`read_jsonl`, factored so every line
    producer — the built-in text scan, the ``.zst``/``.xz`` walker in
    ``sources/compressed.py``, a stream — shares ONE ``from_json``
    expression and ONE malformed policy. ``lines`` must carry a
    ``value: string`` column."""
    if malformed not in ("drop", "fail", "keep"):
        raise ValueError(f"malformed must be drop|fail|keep, got {malformed!r}")
    marked = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    marked_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in marked.fields
    )
    mode = "FAILFAST" if malformed == "fail" else "PERMISSIVE"
    parsed = (
        lines
        .filter(F.trim("value") != "")  # blank lines are not records
        .select(
            F.from_json(
                F.col("value"),
                marked_ddl,
                {"mode": mode, "columnNameOfCorruptRecord": "_corrupt_record"},
            ).alias("r"),
            F.col("value").alias("_raw"),
        )
    )
    if malformed == "keep":
        # from_json leaves _corrupt_record unset in some whole-line
        # failure shapes; normalize: corrupt <=> carry the raw line
        return parsed.select(
            "r.*", "_raw"
        ).withColumn(
            "_corrupt_record",
            F.when(F.col("_corrupt_record").isNotNull(), F.col("_raw")),
        ).drop("_raw")
    return (
        parsed.select("r.*")
        .filter(F.col("_corrupt_record").isNull())
        .drop("_corrupt_record")
    )


def read_jsonl_compressed(
    spark: SparkSession,
    path: str,
    schema: StructType,
    malformed: str = "drop",
) -> DataFrame:
    """``read_jsonl`` for the shard formats Hadoop's codec registry
    cannot decode — ``.jsonl.zst`` / ``.jsonl.xz`` (what modern LLM
    corpora ship; this container's Hadoop raises CODEC_NOT_AVAILABLE
    for both). Lines come from the incremental bounded walker in
    ``sources/compressed.py`` (binaryFile scan, per-file parallelism
    — gzip's model), then the SAME parse stage and malformed policy
    as the plain source."""
    from distributed_computing_projects_spark.sources.compressed import (
        compressed_lines,
    )

    return parse_jsonl_lines(compressed_lines(spark, path), schema, malformed)


def read_jsonl_auto(
    spark: SparkSession,
    path: str,
    schema: StructType,
    malformed: str = "drop",
) -> DataFrame:
    """Suffix router: ``.zst``/``.xz`` go through the engine's own
    walker, everything else (plain, ``.gz``, ``.bz2``, ``.lz4``, …)
    through the built-in text scan — Hadoop's bz2 path splits inside
    a file, which the walker cannot, so the built-in wins whenever it
    can read the codec at all. A directory or glob is routed by the
    suffixes of the files it actually matches (local-FS peek; a
    non-local path that can't be peeked routes by its own suffix)."""

    _LZ4_FRAME_MAGIC = b"\x04\x22\x4d\x18"

    def _is_walker_file(name: str) -> bool:
        n = name.lower()
        if n.endswith(".zst") or n.endswith(".xz"):
            return True
        if n.endswith(".lz4"):
            # .lz4 is ambiguous: Hadoop's codec reads its OWN block
            # framing, the rest of the world writes standard frames
            # (which Hadoop throws on). Sniff the magic when the file
            # is locally readable; unreadable -> assume standard
            # frames (the wild's dominant layout).
            try:
                with open(name, "rb") as f:
                    return f.read(4) == _LZ4_FRAME_MAGIC
            except OSError:
                return True
        return False

    p = path.rstrip("*").rstrip("/")
    if p.lower().endswith((".zst", ".xz")):
        return read_jsonl_compressed(spark, path, schema, malformed)
    peeked = False
    try:
        import glob as globmod
        import os as osmod

        if osmod.path.isdir(path):
            names = [osmod.path.join(path, n)
                     for n in osmod.listdir(path)]
        else:
            names = globmod.glob(path)
        # Spark's own InMemoryFileIndex convention: _SUCCESS /
        # _spark_metadata / .crc sidecars and subdirectories are not
        # data files and must not sway (or break) the routing
        names = [n for n in names
                 if not osmod.path.basename(n).startswith(("_", "."))
                 and not osmod.path.isdir(n)]
        if names:
            peeked = True
            flags = [_is_walker_file(n) for n in names]  # one pass
            if all(flags):
                return read_jsonl_compressed(spark, path, schema,
                                             malformed)
            if any(flags):
                raise ValueError(
                    f"{path} mixes walker (.zst/.xz/standard-frame "
                    ".lz4) and Hadoop-codec shards — read the two "
                    "groups separately")
    except OSError:
        pass  # non-local FS: fall through to the suffix route
    if not peeked and p.lower().endswith(".lz4"):
        # unpeekable .lz4: standard frames are the wild's dominant
        # layout; Hadoop-framed users call read_jsonl directly
        return read_jsonl_compressed(spark, path, schema, malformed)
    return read_jsonl(spark, path, schema, malformed)


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
):
    """Streaming twin of ``read_jsonl(malformed='drop')``: a text file
    stream (the landing-zone pattern — files arriving in a directory)
    parsed per line with the same drop policy. Identical parse
    expression, so batch and stream agree record-for-record; the
    malformed-drop filter runs before any stateful operator, keeping
    corrupt lines out of state stores entirely."""
    marked = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    marked_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in marked.fields
    )
    return (
        spark.readStream.text(path)
        .filter(F.trim("value") != "")
        .select(
            F.from_json(
                F.col("value"),
                marked_ddl,
                {"mode": "PERMISSIVE",
                 "columnNameOfCorruptRecord": "_corrupt_record"},
            ).alias("r")
        )
        .select("r.*")
        .filter(F.col("_corrupt_record").isNull())
        .drop("_corrupt_record")
    )


def write_jsonl(df, path: str, mode: str = "overwrite") -> None:
    """JSONL sink (symmetric with the source): one JSON object per
    line via Spark's json writer — null fields are OMITTED from the
    object (standard JSONL convention; a reader's missing-field policy
    treats them as null, so roundtrip preserves values)."""
    df.write.mode(mode).json(path)
