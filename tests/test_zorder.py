"""Z-order layout: the write-side claim — files clustered by the Morton
key carry narrow per-file min/max spans on BOTH interleaved dimensions,
so a selective predicate on either one prunes most files."""

from __future__ import annotations

import pyarrow.parquet as pq
import glob

from pyspark.sql import functions as F

from distributed_computing_projects_spark.operators.zorder import (
    interleave2,
    write_zordered,
)

N_FILES = 8


def _spans(path, col):
    """Per-file (min, max) of ``col`` from parquet footer stats — the
    same stats a scan's file/row-group pruning reads."""
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo = min(_stat(md, i, col)[0] for i in range(md.num_row_groups))
        hi = max(_stat(md, i, col)[1] for i in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def _stat(md, rg, col):
    g = md.row_group(rg)
    for j in range(g.num_columns):
        c = g.column(j)
        if c.path_in_schema == col:
            return c.statistics.min, c.statistics.max
    raise KeyError(col)


def test_zordered_files_are_prunable_on_both_dims(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    keyed = li.select(
        F.expr("CAST(datediff(l_shipdate, DATE '1990-01-01') AS BIGINT)")
        .alias("day_off"),
        F.expr("CAST(l_partkey % 65536 AS BIGINT)").alias("pk16"),
    ).withColumn("zkey", F.expr(interleave2("day_off", "pk16", 16,
                                            "spark")))

    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zord")
    # baseline: same file count, clustered on NOTHING (round-robin)
    keyed.repartition(N_FILES).write.parquet(plain)
    write_zordered(keyed, "zkey", zord, N_FILES)

    def total_span(path, col):
        return sum(hi - lo for lo, hi in _spans(path, col))

    # z-ordered files must tighten the summed per-file span on BOTH
    # dimensions vs the unclustered layout (each plain file spans
    # ~the full range; z-ordered files cover disjoint quad-tree cells)
    for col in ("day_off", "pk16"):
        z, p = total_span(zord, col), total_span(plain, col)
        assert z < 0.7 * p, (col, z, p)

    # and the pruning is real: a selective day predicate must skip
    # most z-ordered files outright on footer stats
    lo_day = [lo for lo, _ in _spans(zord, "day_off")]
    hi_day = [hi for _, hi in _spans(zord, "day_off")]
    cut_lo, cut_hi = 2000, 2100  # a ~3% day window
    overlapping = sum(1 for lo, hi in zip(lo_day, hi_day)
                      if not (hi < cut_lo or lo > cut_hi))
    assert overlapping <= N_FILES // 2, (overlapping, list(zip(lo_day,
                                                               hi_day)))

    # correctness: the clustered copy is the same multiset of rows
    assert (spark.read.parquet(zord).count()
            == spark.read.parquet(plain).count() == keyed.count())
