"""Z-order (Morton) data layout: multi-dimensional clustering for scans.

At 100 TB the scan is the query plan's biggest line item, and parquet
data-skipping (row-group/file min-max stats) is what keeps a selective
two-dimensional predicate from reading the whole table. Sorting by one
column clusters that column only; interleaving the bits of two (or
more) normalized columns into a single Morton key clusters BOTH — a
range write (`repartitionByRange` + `sortWithinPartitions` on the key)
then yields files whose per-file min/max span on EVERY interleaved
dimension is narrow, so a predicate on either dimension prunes files.
(The same layout idea as Delta/Iceberg OPTIMIZE ZORDER BY; public
algorithm: Morton 1966.)

Everything here is JVM-side codegen: the key is a pure bit expression
(shift/and/or), generated in both engine dialects so the two-engine
correctness gate can hash-compare the key math itself. No UDFs, no
shuffle beyond the one range exchange a clustered write requires.

``interleave2`` normalizes nothing — callers pass already-bounded
non-negative ints (the query uses day offsets and a modulo; a general
pipeline would rank or scale first). Bits interleave x into even and y
into odd positions, so equal prefixes of the key = equal quad-tree
cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from distributed_computing_projects_spark.functions.text import _check


def interleave2(x: str, y: str, bits: int, dialect: str) -> str:
    """Morton-interleave the low ``bits`` of two non-negative BIGINT
    expressions: x -> even bit positions, y -> odd. Emitted as a flat
    OR of shift/mask terms — whole-stage-codegen-friendly in Spark and
    plain integer ops in ANSI SQL."""
    _check(dialect)
    if not 1 <= bits <= 31:
        # 32+ would shift y's top bit into the BIGINT sign bit:
        # negative keys sort before everything and break the layout
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    if dialect == "spark":
        def shl(e: str, n: int) -> str:
            return f"shiftleft({e}, {n})" if n else e

        def shr(e: str, n: int) -> str:
            return f"shiftright({e}, {n})" if n else e
    else:
        def shl(e: str, n: int) -> str:
            return f"(({e}) << {n})" if n else e

        def shr(e: str, n: int) -> str:
            return f"(({e}) >> {n})" if n else e

    xs = f"CAST({x} AS BIGINT)"
    ys = f"CAST({y} AS BIGINT)"
    terms = []
    for i in range(bits):
        terms.append(shl(f"(({shr(xs, i)}) & 1)", 2 * i))
        terms.append(shl(f"(({shr(ys, i)}) & 1)", 2 * i + 1))
    return "(" + " | ".join(terms) + ")"


# Range-exchange sample size while computing the clustered write's
# split points. Spark's default (100 rows/partition, seeded by RDD id)
# leaves the per-file key boundaries jittery from run to run — fine for
# a transient shuffle, wrong for a LAYOUT write whose whole point is
# tight per-file spans that a later scan prunes on. A layout write is
# rare and already pays a full sort; the extra sampling cost is noise.
_LAYOUT_SAMPLE_SIZE = 10_000


def write_zordered(df: DataFrame, zkey_col: str, path: str,
                   n_files: int) -> None:
    """Cluster ``df`` into ``n_files`` parquet files by the Morton key:
    one range exchange (split points from an oversized sample — see
    ``_LAYOUT_SAMPLE_SIZE``), then a within-partition sort so row
    groups inside each file are clustered too. Per-file min/max stats
    on the interleaved dimensions become tight — the data-skipping
    layout (asserted in tests/test_zorder.py)."""
    conf = df.sparkSession.conf
    key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    prev = conf.get(key, None)
    conf.set(key, str(_LAYOUT_SAMPLE_SIZE))
    try:
        (df.repartitionByRange(n_files, zkey_col)
           .sortWithinPartitions(zkey_col)
           .write.mode("overwrite").parquet(path))
    finally:
        if prev is None:
            conf.unset(key)
        else:
            conf.set(key, prev)
