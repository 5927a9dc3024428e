"""Wine-reviews filter-aggregate — reference application #2.

Reference: for rows where ``variety == 'Chardonnay'`` emit one
``(region_2, "1")`` **per occurrence** of the token ``succulent`` in
``description`` (mp3/src/mj_wine/wine_maple.go:9-20 — note the loop over
``strings.Fields``, NOT a boolean contains), then sum per key
(mp3/src/mj_wine/wine_juice.go:7-15).

The per-occurrence multiplicity is the trap (SURVEY §7.3.1):
``array_contains`` would undercount rows where the token repeats.
Spark shape: filter → explode(split) → filter token → groupBy count.
All built-ins, fully codegen'd; the filter on the dimension column is
pushed to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from distributed_computing_projects_spark.operators.wordcount import TOKEN_SPLIT


def token_occurrence_agg(
    df: DataFrame,
    predicate: Column,
    text_col: str,
    token: str,
    group_col: str,
) -> DataFrame:
    """DataFrame[<group_col>, occurrences: bigint] — per-occurrence token
    count grouped by ``group_col``, over rows passing ``predicate``."""
    return (
        df.filter(predicate)
        .select(group_col, F.explode(F.split(F.col(text_col), TOKEN_SPLIT)).alias("_tok"))
        .filter(F.col("_tok") == token)
        .groupBy(group_col)
        .agg(F.count("*").alias("occurrences"))
        .orderBy(group_col)
    )
