"""Document chunking: fixed-size token windows with overlap — engine
extension (the retrieval / training-data chunker; the reference has no
analog — its text path is whole-line, mp1/mp3 grep and wordcount).

Entirely JVM-side (``split`` / ``sequence`` / ``slice`` / ``explode``)
— no UDF, no shuffle: chunking is a narrow per-row flatMap, so at
100 TB it pipelines inside the scan stage and parallelism is the file
split count. Contrast with sequence packing (``operators/packing.py``),
which is inherently sequential per shard and needs one exchange.

Semantics:
- tokens = whitespace split, empties dropped (``functions/text.tokens``
  — the same tokenizer every text operator here uses);
- chunk starts at token offsets 0, step, 2*step, ... with
  ``step = chunk_tokens - overlap_tokens``;
- the last chunk of a doc may be shorter than ``chunk_tokens`` (its
  ``n_tokens`` says so); a doc with zero tokens yields ZERO chunks
  (there is nothing to embed or train on — callers that need the doc
  row back join on doc_id);
- every chunk carries (doc_id, chunk_id, start_token, n_tokens,
  chunk_text) so provenance survives downstream shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from distributed_computing_projects_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    overlap_tokens: int = 0,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """DataFrame[doc_id, chunk_id, start_token, n_tokens, chunk_text
    (+ carry...)]: overlapping fixed-token windows over each document.
    ``carry`` columns (e.g. source/lang) pass through to every chunk
    row — still a narrow flatMap, no join needed for provenance."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens), got "
            f"{overlap_tokens}"
        )
    step = chunk_tokens - overlap_tokens
    toks = tokens(text_col, "spark")
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            *[F.col(c) for c in carry],
            F.expr(toks).alias("_t"),
        )
        .withColumn("_n", F.size("_t"))
        .filter(F.col("_n") > 0)
        .select(
            "doc_id",
            *carry,
            "_t",
            "_n",
            F.explode(F.expr(f"sequence(0, _n - 1, {step})")).alias("_start"),
        )
        .select(
            "doc_id",
            *carry,
            (F.col("_start") / step).cast("bigint").alias("chunk_id"),
            F.col("_start").cast("bigint").alias("start_token"),
            F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_start"))
            .cast("bigint")
            .alias("n_tokens"),
            F.expr(f"concat_ws(' ', slice(_t, _start + 1, {chunk_tokens}))")
            .alias("chunk_text"),
        )
    )
