"""Line-oriented text source with grep provenance.

The reference's only record format is the text line
(mp3/src/maple/mapler.go:41-43) and its grep result carries
``{MemberID, LineNumber, MatchedContent}`` (mp3/src/logs.go:26-30,
line numbers counted from 0 per file, :188-193).

Spark's text datasource gives the line and the file; the per-file line
number is reconstructed per-partition: each input split is scanned in
order, so numbering (file, split_start_offset, index_in_split) and then
ranking by a window is exact. For plain ``spark.read.text`` Spark keeps
one file per partition ordering within a split, and
``monotonically_increasing_id`` is monotone within a partition —
ranking it inside a per-file window yields stable 0-based line numbers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_lines(spark: SparkSession, path: str, machine_from_filename: bool = True) -> DataFrame:
    """DataFrame[machine: string, line_no: bigint, line: string].

    ``machine`` is the basename of the source file (the reference's
    member id — one log file per VM, mp3/src/logs.go:40-56).
    """
    raw = (
        spark.read.text(path)
        .select(
            F.input_file_name().alias("_file"),
            F.monotonically_increasing_id().alias("_mid"),
            F.col("value").alias("line"),
        )
    )
    w = Window.partitionBy("_file").orderBy("_mid")
    machine = (
        F.regexp_extract(F.col("_file"), r"([^/]+)$", 1)
        if machine_from_filename
        else F.col("_file")
    )
    return (
        raw.withColumn("line_no", F.row_number().over(w) - F.lit(1))
        .select(machine.alias("machine"), "line_no", "line")
    )
