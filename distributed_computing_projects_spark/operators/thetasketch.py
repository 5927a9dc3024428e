"""Theta-style KMV set-operation estimates — engine-exact.

``operators/sketches.py`` gives per-group KMV cardinalities and a
lossless UNION merge (k smallest of the union). This module adds the
INTERSECTION estimate the theta-sketch literature builds on the same
structure: with two kept sets :math:`A_k, B_k` and
:math:`\\theta = \\min(kth_A, kth_B)`, every hash below θ is present
in BOTH kept sets iff it is in the intersection (each set is
complete below its own kth minimum, hence below θ), so

    est = |A_k ∩ B_k ∩ [0, θ)| · HASH_SPACE / θ

— set membership and the count are exact integers, θ is an exactly-
determined integer, and the estimate is ONE IEEE division: the KMV/
HLL one-division discipline, extended from cardinality to set
algebra. No float ever enters the sample selection, so the two
engines agree bit-for-bit.

Deliberately a separate module (the round-15 rotation lesson): the
matrix rotation hashes import closures, and editing
``operators/sketches.py`` would flag every KMV/CMS/Bloom query for
re-verification; importing it from here churns nothing.

Scale shape: the distinct (grp, h) shuffle is the only data-sized
exchange (shared with the KMV queries); everything after operates on
k-row kept sets — the intersection join is k x k at most, broadcast
territory at any corpus size.

Reference: extension surface (BASELINE.json north-star operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_computing_projects_spark.operators import sketches as SK


def intersect_estimate(pairs: DataFrame, grp_a: str, grp_b: str,
                       k: int = SK.K_DEFAULT) -> DataFrame:
    """One row: (grp_a, grp_b, theta, n_common_below_theta,
    est_common, exact_common_hashes) for two groups of a distinct
    (grp, h) pair table. ``exact_common_hashes`` (the calibration
    column) rides the same pair table: a self-join on h between the
    two groups' FULL hash sets."""
    two = pairs.filter(F.col("grp").isin([grp_a, grp_b]))
    w = Window.partitionBy("grp").orderBy("h")
    kept = (
        two.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    kth = kept.groupBy("grp").agg(F.max("h").alias("kth"),
                                  F.count("*").alias("n_kept"))
    # theta = min of the two kth minima; a group with fewer than k
    # distinct hashes is COMPLETE, so its theta is the full space
    theta_df = kth.select(
        F.when(F.col("n_kept") < k, F.lit(SK.HASH_SPACE))
        .otherwise(F.col("kth")).alias("theta_g"))
    theta = theta_df.agg(F.min("theta_g").alias("theta"))
    a = kept.filter(F.col("grp") == grp_a).select("h")
    b = kept.filter(F.col("grp") == grp_b).select("h")
    common = (
        a.join(b, "h")
        .join(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count("*").cast("bigint")
             .alias("n_common_below_theta"))
    )
    exact = (
        pairs.filter(F.col("grp") == grp_a).select("h")
        .join(pairs.filter(F.col("grp") == grp_b).select("h"), "h")
        .agg(F.count("*").cast("bigint")
             .alias("exact_common_hashes"))
    )
    return (
        common.join(F.broadcast(theta))
        .join(F.broadcast(exact))
        .select(
            F.lit(grp_a).alias("grp_a"),
            F.lit(grp_b).alias("grp_b"),
            F.col("theta").cast("bigint").alias("theta"),
            "n_common_below_theta",
            (F.col("n_common_below_theta").cast("double")
             * F.lit(float(SK.HASH_SPACE))
             / F.col("theta").cast("double")).alias("est_common"),
            "exact_common_hashes",
        )
    )
