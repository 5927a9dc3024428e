"""Histogram quantile sketch — mergeable, engine-exact.

The quantile analogue of the KMV/HLL discipline (``operators/
sketches.py``, ``operators/hll.py``): streaming quantile sketches in
the literature (GK, t-digest, KLL) carry data-dependent float
centroids whose merge order changes the result — unusable under this
repo's two-engine hash gate. A FIXED-WIDTH histogram gives up
adaptivity for exactness: the bin of a value is ONE IEEE multiply and
a floor (``floor(v * width_inv)`` — both exactly-rounded, so both
engines agree bit-for-bit), counts are integers, the merge is integer
SUM (a distributive aggregate: map-side partial aggregation IS the
sketch merge, bounding the exchange at bins-per-group cells per
partition), and a quantile reads off the cumulative counts with the
estimate ``bin / width_inv`` — one division of exactly-determined
integers. Error is bounded by the bin width, stated not hidden: the
estimate is the LOWER EDGE of the bin holding the ceil(q*n)-th value,
so ``true quantile ∈ [est, est + 1/width_inv)``.

Deliberately a separate module (the round-15 rotation lesson): an
append to a hot shared module flags every importer's queries for
re-verification.

Scale shape: one data-sized shuffle (the (grp, bin) aggregate), then
a window over BIN COUNTS — rows bounded by groups x occupied bins,
constant in the corpus. Registers being plain (grp, bin, count) rows
means the sketch persists/merges through any store the engine
already has.

Reference: extension surface (BASELINE.json north-star operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WIDTH_INV = 16  # bins are 1/16 wide: estimate error < 0.0625


def value_bins(df: DataFrame, group_col: str, value_col: str,
               width_inv: int = WIDTH_INV) -> DataFrame:
    """(grp, bin, n): the sketch itself — mergeable by integer SUM.
    Nulls are not observations and drop here."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("grp"),
            F.floor(F.col(value_col) * F.lit(float(width_inv)))
            .cast("bigint").alias("bin"))
        .groupBy("grp", "bin")
        .agg(F.count("*").alias("n"))
    )


def hist_quantiles(bins: DataFrame,
                   qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                   width_inv: int = WIDTH_INV) -> DataFrame:
    """(grp, n, q50_est, ...): for each q the LOWER EDGE of the bin
    holding the ceil(q*n)-th smallest value. Cumulative counts over
    bins ordered by bin — a window over bin-count rows, not data
    rows."""
    w = Window.partitionBy("grp").orderBy("bin") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total_w = Window.partitionBy("grp")
    cum = (
        bins.withColumn("cum", F.sum("n").over(w))
        .withColumn("total", F.sum("n").over(total_w))
    )
    aggs = [F.sum("n").cast("bigint").alias("n")]
    for q in qs:
        name = f"q{int(q * 100)}_est"
        rank = F.expr(f"CAST(ceil({q!r} * total) AS BIGINT)")
        aggs.append(
            (F.min(F.when(F.col("cum") >= rank, F.col("bin")))
             .cast("double") / F.lit(float(width_inv))).alias(name))
    return cum.groupBy("grp").agg(*aggs)


def quantile_sketch(df: DataFrame, group_col: str, value_col: str,
                    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                    width_inv: int = WIDTH_INV) -> DataFrame:
    """Sketch + quantile read-off in one call."""
    return hist_quantiles(
        value_bins(df, group_col, value_col, width_inv),
        qs, width_inv)
