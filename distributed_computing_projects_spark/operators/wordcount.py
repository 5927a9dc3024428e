"""Wordcount — reference application #1.

Reference: maple tokenizes with ``strings.Fields`` and emits
``(word, "1")`` per token (mp3/src/maple/wordcount.go:7-15); juice sums
int-parsed values per key (mp3/src/juice/wordcount.go:7-15). The
reference has NO map-side combining (SURVEY §2.4 A7) — every token
crosses its shuffle as a file line. Spark's HashAggregateExec does
partial+final aggregation automatically, so the shuffle carries one
(word, partial_count) row per word per partition, not one row per
token — the single biggest scale win over the reference design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Go strings.Fields splits on runs of whitespace and produces no empty
# fields; split + filter reproduces that (leading whitespace would
# otherwise yield an empty first token).
TOKEN_SPLIT = r"\s+"


def tokens(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(F.split(F.col(text_col), TOKEN_SPLIT)).alias("word"))
        .filter(F.col("word") != "")
    )


def wordcount(df: DataFrame, text_col: str = "line") -> DataFrame:
    """DataFrame[word: string, n: bigint], deterministically ordered by
    word (the reference's output order is Go-map nondeterministic,
    mp3/src/maplejuice.go:414-418 — we document sort-by-key instead,
    SURVEY §4.3)."""
    return tokens(df, text_col).groupBy("word").agg(F.count("*").alias("n")).orderBy("word")
