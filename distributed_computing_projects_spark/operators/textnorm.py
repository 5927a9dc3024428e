"""Unicode normalization (NFC) — the text-cleaning stage every
multilingual corpus pipeline runs before tokenizing or hashing: the
same visible string can arrive precomposed (U+00E9) or decomposed
(U+0065 U+0301), and un-normalized corpora dedup wrong, tokenize
wrong, and hash wrong.

Spark has no built-in Unicode normalizer, so this is a legitimate
Python stage — Arrow-batched ``mapInPandas`` over CPython's
``unicodedata`` (the same batch contract as the media decoders; never
a row-at-a-time UDF). The differential story is unusually strong: the
oracle normalizes with DuckDB's ``nfc_normalize`` (utf8proc), a fully
independent Unicode implementation, and the query compares the
NORMALIZED STRINGS themselves — two unrelated codebases must agree on
the Unicode canonical-composition tables character for character
(the html_extract_text string-compare discipline).

Scale shape: embarrassingly parallel projection — no shuffle, no
state; the Python cost is one table-driven pass per string.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from distributed_computing_projects_spark.operators.spread import spread

NORM_SCHEMA = (
    "id bigint, normalized string, n_chars_before int, n_chars_after int"
)


def nfc_normalize(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, normalized, n_chars_before, n_chars_after): NFC-normalize
    ``text_col``. Character counts are code-point counts on both
    sides (inputs are kept to the BMP, where Spark's ``length`` —
    UTF-16 code units — agrees with code points)."""
    import unicodedata

    def _norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            normed = [
                unicodedata.normalize("NFC", t) for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "normalized": normed,
                    "n_chars_before": [len(t) for t in pdf["text"]],
                    "n_chars_after": [len(t) for t in normed],
                }
            )

    cols = spread(df).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )
    return cols.mapInPandas(_norm, schema=NORM_SCHEMA)
