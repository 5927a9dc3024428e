"""Distributed grep — the reference's flagship interactive query.

Reference: ``grep [all] <regex>`` fans a regex to every node over UDP,
each scans its local log line-by-line, hits stream back with
provenance (mp3/src/logs.go:88-157, match loop :186-193; mp0 RPC
variant mp0/src/service/client.go:36-77).

Spark shape: the fan-out/gather IS partition scheduling; the query is a
scan + ``rlike`` filter. At 100 TB this is a single stage, no shuffle:
the regex filter cannot be pushed into parquet, but column pruning is
(only the text + provenance columns are read), and the filter runs
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grep(df: DataFrame, pattern: str, text_col: str = "line",
         provenance_cols: list[str] | None = None) -> DataFrame:
    """Rows whose ``text_col`` matches ``pattern`` (unanchored regex,
    same semantics as Go ``regexp.MatchString``, mp3/src/logs.go:186-193).
    """
    cols = list(provenance_cols or [c for c in df.columns if c != text_col])
    return df.filter(F.col(text_col).rlike(pattern)).select(*cols, text_col)


def grep_count(df: DataFrame, pattern: str, text_col: str = "line") -> int:
    """Count of matches (client-side tally, mp0/src/service/client.go:70-76)."""
    return df.filter(F.col(text_col).rlike(pattern)).count()


def tail_n(df: DataFrame, n: int, order_col: str) -> DataFrame:
    """Last ``n`` rows by ``order_col`` (``print logs -n``,
    mp3/src/logs.go:59-85), returned in ascending order.

    Spark's TakeOrderedAndProject handles desc+limit without a full
    sort: per-partition top-n then a driver merge — scale-safe.
    """
    return (
        df.orderBy(F.col(order_col).desc()).limit(n).orderBy(F.col(order_col).asc())
    )
