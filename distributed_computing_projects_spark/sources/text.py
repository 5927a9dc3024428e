"""Line-oriented text source with grep provenance.

The reference's only record format is the text line
(mp3/src/maple/mapler.go:41-43) and its grep result carries
``{MemberID, LineNumber, MatchedContent}`` (mp3/src/logs.go:26-30,
line numbers counted from 0 per file, :188-193).

Spark's text datasource gives the line and the file; the per-file line
number is reconstructed by ranking ``(input_file_block_start,
monotonically_increasing_id)`` inside a per-file window:

- a file larger than ``spark.sql.files.maxPartitionBytes`` is cut into
  splits, and Spark assigns split->partition by SIZE order, not offset
  order — so partition id (the high bits of the monotonic id) alone
  would number out-of-order splits wrongly. ``input_file_block_start``
  is the split's byte offset, which restores offset order exactly;
- within one split (one partition, or several small files packed into
  one partition) ``monotonically_increasing_id`` is monotone in read
  order, which is line order — text splits hand each line to the split
  containing its first byte (Hadoop LineRecordReader), so per-split
  line sequences are disjoint and offset-ordered.

This makes the numbering exact for any file size / split layout.
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
            F.input_file_block_start().alias("_block"),
            F.monotonically_increasing_id().alias("_mid"),
            F.col("value").alias("line"),
        )
    )
    w = Window.partitionBy("_file").orderBy("_block", "_mid")
    machine = (
        F.regexp_extract(F.col("_file"), r"([^/]+)$", 1)
        if machine_from_filename
        else F.col("_file")
    )
    return (
        raw.withColumn("line_no", (F.row_number().over(w) - F.lit(1)).cast("bigint"))
        .select(machine.alias("machine"), "line_no", "line")
    )
