"""HyperLogLog distinct-count sketch — engine-exact registers AND
estimate (Flajolet/Fusy/Gandouet/Meunier 2007).

The KMV docstring (``operators/sketches.py``) records why HLL was
deferred there: the textbook estimator sums ``2^-rho`` in floating
point, and a float SUM is order-dependent, so two engines cannot be
expected to agree bit-for-bit. This module removes the float from
the sum: every register contributes the exact BIGINT
``2^(SCALE - rho)`` (``rho <= 33 < SCALE``, so terms are integers;
``m * 2^SCALE`` fits comfortably in 63 bits), the harmonic
denominator is an exact integer both engines agree on, and the
estimate is ONE IEEE division of a shared double literal by that
integer — the same one-division discipline as KMV, applied to the
harder sketch.

``rho`` itself is integer too: ``bin()`` is unpadded in both Spark
and DuckDB, so ``length(bin(w)) = floor(log2 w) + 1`` exactly — no
float log anywhere. The spec's small-range (linear counting)
correction needs ``ln()``, whose last-ulp behaviour is
engine-specific, so it is NOT folded into ``est_distinct``; the
``n_zero_registers`` column carries everything a caller needs to
apply it, and ``exact_distinct_hashes`` rides the same pass for
calibration.

Deliberately a SEPARATE module from ``operators/sketches``: the
correctness-matrix rotation hashes each query's import closure, so
adding a sketch must not flag every KMV/count-min/bloom query as
changed (round-15 lesson — an append to a hot shared module costs 79
green rows a re-verification).

Scale shape: one data-sized DISTINCT shuffle (which also buys the
exact count), then two partial aggregates whose key spaces are
bounded by ``groups x m`` and ``groups`` — constant in the corpus.
Registers merge by MAX, so sketches are mergeable across partitions,
epochs, and stores by construction.

Reference: extension surface (BASELINE.json north-star operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_B = 10                  # register index bits
HLL_M = 1 << HLL_B          # 1024 registers: ~3.25% std error
HLL_SCALE = 40              # 2^(SCALE-rho) is integral for rho <= 33
# alpha_m for m >= 128 (Flajolet et al. 2007, Fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# the whole numerator as ONE double literal shared by both dialects
HLL_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_SCALE)

# rho = leading zeros of the 32-bit w, + 1; w = 0 means 32 zeros.
HLL_RHO = "CASE WHEN {w} = 0 THEN 33 ELSE 33 - length(bin({w})) END"


def hash32b(expr: str, dialect: str) -> str:
    """SECOND 32 bits of md5 as BIGINT — an independent portable
    hash from the digest both engines already share bit-for-bit
    (``functions/text.py hash32`` takes the first 32; HLL needs two:
    one for the register index, one for the leading-zero pattern)."""
    if dialect not in ("spark", "duck"):
        raise ValueError(f"unknown dialect {dialect!r}")
    if dialect == "spark":
        return f"CAST(conv(substring(md5({expr}), 9, 8), 16, 10) AS BIGINT)"
    return f"CAST(concat('0x', substring(md5({expr}), 9, 8)) AS BIGINT)"


def token_hll_pairs(docs: DataFrame, group_col: str,
                    text_col: str) -> DataFrame:
    """(grp, bucket, w): register index from the first md5 half,
    pattern word from the second, DISTINCT — max(rho) is idempotent
    so HLL itself doesn't need the distinct, but it lets the exact
    distinct-hash count ride the same single pass."""
    from distributed_computing_projects_spark.functions import text as T

    toks = T.tokens(text_col, "spark")
    return (
        docs.select(F.col(group_col).alias("grp"),
                    F.explode(F.expr(toks)).alias("token"))
        .select(
            "grp",
            F.expr(f"{T.hash32('token', 'spark')} % {HLL_M}")
            .alias("bucket"),
            F.expr(hash32b("token", "spark")).alias("w"))
        .distinct()
    )


def hll_sketch(pairs: DataFrame) -> DataFrame:
    """Per-group HLL over distinct (bucket, w) pairs:
    (grp, n_registers_hit, n_zero_registers, harmonic_scaled,
    est_distinct, exact_distinct_hashes). Two partial aggregates —
    register fold then group fold — after the one data-sized
    distinct shuffle; everything integer until the final division."""
    rho = HLL_RHO.format(w="w")
    regs = (
        pairs.groupBy("grp", "bucket")
        .agg(F.expr(f"max({rho})").alias("r"),
             F.count("*").alias("cnt"))
    )
    return (
        regs.groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("n_registers_hit"),
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                         f"{HLL_SCALE} - r)")).alias("_hp"),
            F.sum("cnt").cast("bigint")
            .alias("exact_distinct_hashes"),
        )
        .select(
            "grp", "n_registers_hit",
            (F.lit(HLL_M) - F.col("n_registers_hit"))
            .cast("bigint").alias("n_zero_registers"),
            (F.col("_hp")
             + (F.lit(HLL_M) - F.col("n_registers_hit"))
             * F.lit(1 << HLL_SCALE)).alias("harmonic_scaled"),
            "exact_distinct_hashes",
        )
        .withColumn(
            "est_distinct",
            F.lit(HLL_NUM) / F.col("harmonic_scaled").cast("double"))
        .withColumn(
            "small_range",
            # the spec's linear-counting regime: E <= 2.5m with empty
            # registers — a deterministic comparison on the already-
            # deterministic estimate, flagging where a caller should
            # apply the ln() correction this column set deliberately
            # leaves out of the hashed estimate
            (F.col("est_distinct") <= F.lit(2.5 * HLL_M))
            & (F.col("n_zero_registers") > 0))
        .select("grp", "n_registers_hit", "n_zero_registers",
                "harmonic_scaled", "est_distinct", "small_range",
                "exact_distinct_hashes")
    )
