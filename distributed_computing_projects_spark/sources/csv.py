"""CSV source + tab-KV sink with the reference's exact edge policies.

Source (SURVEY §2.1 S3): the reference parses CSV per line with
``encoding/csv`` and SKIPS records that fail to parse — notably
multi-line quoted descriptions, which per-line parsing can never see
(mp3/src/mj_wine/wine_maple.go:9-13). Two modes here:

- ``malformed='drop'`` (reference parity): ``mode=DROPMALFORMED``,
  single-line records only — byte-for-byte the reference's skip
  behavior;
- ``malformed='multiline'`` (the fix): ``multiLine=True`` so quoted
  newlines parse as one record — documented divergence, off by
  default.

Sink (SURVEY §2.1 S11): ``key\\tvalue`` lines, the Hadoop-streaming
twin output contract (mp3/src/hadoop_wine/mapper/map.go:22-24,
reducer/reduce.go:41-43; golden file output/part-00000 is key-sorted —
we sort within partitions for deterministic files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# The 11-column wine-reviews schema (mp3/src/hadoop_wine/small.csv:1 —
# ",country,description,designation,points,price,province,region_1,
# region_2,variety,winery"; all strings except points/price).
WINE_SCHEMA = StructType(
    [
        StructField("row_id", IntegerType()),
        StructField("country", StringType()),
        StructField("description", StringType()),
        StructField("designation", StringType()),
        StructField("points", IntegerType()),
        StructField("price", DoubleType()),
        StructField("province", StringType()),
        StructField("region_1", StringType()),
        StructField("region_2", StringType()),
        StructField("variety", StringType()),
        StructField("winery", StringType()),
    ]
)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    malformed: str = "drop",
) -> DataFrame:
    """Schema'd CSV scan with an explicit malformed-record policy."""
    if malformed not in ("drop", "multiline", "fail"):
        raise ValueError(f"malformed must be drop|multiline|fail, got {malformed!r}")
    if malformed == "drop":
        # Exact reference semantics = parse each LINE as its own CSV
        # record (scanner.Scan + csv.Read per line). The csv datasource
        # can't express that: its quote handling spans lines and
        # depends on input-split boundaries (nondeterministic keeps/
        # drops near a split). So: text lines -> from_csv per line;
        # any parse problem (unterminated quote, field-count mismatch,
        # bad int) marks the corrupt column and the record is skipped —
        # encoding/csv's ErrFieldCount/ErrQuote skip behavior
        # (mp3/src/mj_wine/wine_maple.go:10-13).
        from pyspark.sql import functions as F
        from pyspark.sql.types import StringType, StructField, StructType

        from distributed_computing_projects_spark.sources.text import read_lines

        marked = StructType(
            list(schema.fields) + [StructField("_corrupt_record", StringType())]
        )
        marked_ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in marked.fields
        )
        lines = read_lines(spark, path)
        if header:
            lines = lines.filter(F.col("line_no") > 0)
        return (
            lines.select(
                F.from_csv(
                    F.col("line"),
                    marked_ddl,
                    {"mode": "PERMISSIVE",
                     "columnNameOfCorruptRecord": "_corrupt_record"},
                ).alias("r")
            )
            .select("r.*")
            .filter("_corrupt_record IS NULL")
            .drop("_corrupt_record")
        )
    reader = spark.read.schema(schema).option("header", header)
    if malformed == "multiline":
        return reader.option("multiLine", True).option("mode", "PERMISSIVE").csv(path)
    return reader.option("mode", "FAILFAST").csv(path)


def write_tab_kv(kv: DataFrame, path: str, key_col: str = "key",
                 value_col: str = "value") -> None:
    """``key\\tvalue`` text sink, rows sorted by key within each output
    file (the reference concatenates per-key outputs in key order —
    CollectJuices mp3/src/maplejuice.go:540-568 — but Go-map iteration
    makes the global order nondeterministic; we define sorted order,
    SURVEY §4.3). One file per partition: ``coalesce(1)`` upstream only
    if single-file parity is required.

    Written through the TEXT sink, not the CSV writer: the reference
    emits raw ``key + "\\t" + value`` bytes (hadoop_wine Emit), while a
    CSV writer would quote/escape values containing quotes or tabs and
    render empty strings as ``\"\"`` — corrupting the contract for any
    split-on-first-tab consumer."""
    from pyspark.sql import functions as F

    (
        kv.sortWithinPartitions(key_col)
        .select(
            F.concat(
                F.col(key_col).cast("string"),
                F.lit("\t"),
                F.col(value_col).cast("string"),
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )
