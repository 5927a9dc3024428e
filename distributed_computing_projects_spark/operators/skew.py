"""Skew mitigation: salted equi-join.

AQE's skew-join (on in this engine's session, session.py) splits
oversized sort-merge partitions at runtime — the first line of defense.
Salting is the explicit fallback for shapes AQE can't fix: a single
giant key that must co-locate with a non-broadcastable build side, or
aggregation-free pipelines where one reducer would own the hot key.

``salted_join`` spreads each hot big-side key over ``salt`` synthetic
sub-keys and replicates the matching small-side rows ``salt`` times —
turning one hot partition into ``salt`` even ones at the cost of a
``salt``-times-larger small side. Results are exactly the plain join's
(asserted by test against the unsalted join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on columns ``on``, salted.

    The big side's salt hashes the row CONTENT plus a per-row ordinal —
    content alone would give every copy of a fully-duplicated hot row
    the same salt (the canonical skew case is N identical rows), and
    rand() is not stable under task retry. monotonically_increasing_id
    is deterministic for a deterministic input ordering, which parquet
    scans provide. The small side explodes a 0..salt-1 sequence. The
    join keys become (on..., _salt), so one hot key's rows land in
    ``salt`` different shuffle partitions.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    big_s = big.withColumn(
        "_salt",
        F.pmod(
            F.hash(F.struct(*big.columns), F.monotonically_increasing_id()),
            F.lit(salt),
        ),
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, on + ["_salt"], how)
    return out.drop("_salt")
