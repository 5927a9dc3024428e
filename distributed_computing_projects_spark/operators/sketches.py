"""KMV (k-minimum-values) distinct-count sketches, engine-exact.

The sketch tier a 100 TB engine needs for cheap cardinality questions
(vocabulary size per language/source, dedup-rate monitoring) without an
exact distinct over billions of keys. KMV (Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream") keeps the k smallest
distinct hash values of a set; with hashes uniform on [0, M) the
estimator (k-1) * M / h_k is unbiased, and two sketches MERGE by taking
the k smallest of their union — the property that makes the sketch a
distributive aggregate (partition-local sketches combine losslessly, so
the shuffle carries at most k values per partition per group).

Why KMV and not HyperLogLog: HLL's estimate depends on register layout
and bias-correction tables, so no two engines agree bit-for-bit; KMV's
sketch is a SET of hash values and its estimate one IEEE division of
exactly-determined integers — Spark and any ANSI engine reproduce it
exactly (this repo's two-engine correctness gate hash-compares values).

Shapes:
  * ``kmv_token_sketch``: explode -> portable 32-bit hash (JVM-side
    md5 fragment, functions/text.py hash32) -> distinct (group, h)
    [partial aggregation dedups map-side] -> per-group rank window ->
    keep rank <= k -> one aggregate row per group. Two narrow
    exchanges — the distinct on (group, h) and the window's re-key to
    (group) — both carrying 12-byte hash rows only, then the final
    aggregate reuses the window's partitioning.
    The distinct is the only data-sized shuffle; at corpus scale the
    bounded-state path is the same fold done per-partition first (the
    merge property above) — ``tests/test_sketches.py`` proves the
    partition-local fold + merge equals this exact composition.
  * ``merge_sketches``: k smallest distinct hashes across groups —
    by the merge theorem, EXACTLY the sketch of the union set, proven
    against the direct union sketch in pytest.

Estimator edge: a group with fewer than k distinct hashes keeps them
all and its "estimate" is the exact count (cast to double, no division).

Reference parity: the reference engine has no sketch tier (its
aggregates are exact, mp3/src/maple aggregation files); this is an
engine extension from the LLM-pipeline requirements (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_computing_projects_spark.functions import text as T

K_DEFAULT = 256
HASH_SPACE = 1 << 32  # hash32 is uniform on [0, 2^32)


def token_hashes(docs: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """Distinct (group, h) pairs: exploded whitespace tokens under the
    portable 32-bit hash. KMV lives in hash space, so the distinct is
    on h (token pairs colliding in hash merge — that collision noise is
    part of any hashed sketch and identical in both engines)."""
    toks = T.tokens(text_col, "spark")
    return (
        docs.select(F.col(group_col).alias("grp"),
                    F.explode(F.expr(toks)).alias("token"))
        .select("grp", F.expr(T.hash32("token", "spark")).alias("h"))
        .distinct()
    )


def _estimate(k: int):
    """CASE: under-full sketch -> exact count; else (k-1)*M/h_k, one
    IEEE division of exactly-determined integers (engine-stable)."""
    num = float((k - 1) * HASH_SPACE)  # exact in double for k << 2^20
    return F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(num) / F.col("kth_min_hash").cast("double"))


def kmv_sketch(pairs: DataFrame, k: int = K_DEFAULT) -> DataFrame:
    """Per-group KMV: (grp, n_kept, kth_min_hash, est_distinct).

    Two narrow exchanges (distinct on (grp, h), window re-key to grp),
    both hash-rows only; h values are distinct within a group, so the
    rank cut is tie-free and deterministic.
    """
    w = Window.partitionBy("grp").orderBy("h")
    kept = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    return kept.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.max("h").alias("kth_min_hash"),
    ).select(
        "grp", "n_kept", "kth_min_hash",
        _estimate(k).alias("est_distinct"),
    )


def kmv_sketch_with_exact(pairs: DataFrame,
                          k: int = K_DEFAULT) -> DataFrame:
    """Sketch + exact distinct-hash count in ONE pass: rank every
    distinct hash, then a single per-group aggregate derives
    (n_kept, kth_min_hash, est_distinct, exact_distinct_hashes) —
    no second scan, no join-back of an exact side (the naive
    sketch-join-exact shape costs 2x the exchanges; this is the
    calibration-query plan)."""
    w = Window.partitionBy("grp").orderBy("h")
    ranked = pairs.withColumn("rn", F.row_number().over(w))
    in_k = F.col("rn") <= k
    return ranked.groupBy("grp").agg(
        F.count(F.when(in_k, 1)).cast("bigint").alias("n_kept"),
        F.max(F.when(in_k, F.col("h"))).alias("kth_min_hash"),
        F.count("*").cast("bigint").alias("exact_distinct_hashes"),
    ).select(
        "grp", "n_kept", "kth_min_hash",
        _estimate(k).alias("est_distinct"),
        "exact_distinct_hashes",
    )


def kept_values(pairs: DataFrame, k: int = K_DEFAULT) -> DataFrame:
    """The sketch itself: per-group k smallest distinct hashes (the
    mergeable representation a store would persist)."""
    w = Window.partitionBy("grp").orderBy("h")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("grp", "h")
    )


# ---------------------------------------------------------------------------
# Count-min sketch (frequency estimation) — the second sketch family:
# KMV answers "how many distinct", CMS answers "how often is X" with
# d*w bounded counters. Counter cells are plain integer SUMS of
# occurrence counts, so the sketch is engine-exact (unlike probabilistic
# counters there is no estimator randomness — collisions only ever ADD,
# giving the classic one-sided estimate >= truth, pinned in pytest).
# Spark's map-side partial aggregation IS the CMS merge: each partition
# folds to at most d*w cells before the shuffle, so the exchange is
# bounded regardless of corpus size — the sketch property falls out of
# the aggregation plan rather than custom state.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_cell(token_expr: str, i_expr: str, dialect: str) -> str:
    """Cell index for hash row ``i``: the portable 32-bit hash of
    'i:token', mod the (power-of-two) width — nonnegative in both
    engines."""
    if dialect == "spark":
        seeded = f"concat(CAST({i_expr} AS STRING), ':', {token_expr})"
    else:
        seeded = f"(CAST({i_expr} AS VARCHAR) || ':' || {token_expr})"
    return f"({T.hash32(seeded, dialect)} % {CMS_WIDTH})"


def cms_table(occ: DataFrame, token_col: str = "token") -> DataFrame:
    """(i, cell, c): the d x w counter matrix over one row per token
    OCCURRENCE. One aggregate; the shuffle is bounded at d*w rows per
    upstream partition by partial aggregation (the merge property)."""
    with_i = occ.select(
        F.col(token_col).alias("token"),
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("i"),
    )
    return (
        with_i.select(
            "i",
            F.expr(_cms_cell("token", "i", "spark")).alias("cell"),
        )
        .groupBy("i", "cell")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def cms_estimates(occ: DataFrame, top_n: int,
                  token_col: str = "token") -> DataFrame:
    """(token, exact_count, cms_estimate) for the top_n most frequent
    tokens (count desc, token asc — deterministic cut): estimate =
    min over the d rows of the token's cells, always >= exact (the
    one-sided CMS bound). The probe side is top_n*d rows joining a
    d*w table — both broadcastable at any corpus size."""
    cms = cms_table(occ, token_col)
    top = (
        occ.groupBy(F.col(token_col).alias("token"))
        .agg(F.count("*").cast("bigint").alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("token").asc())
        .limit(top_n)
    )
    probe = top.select(
        "token", "exact_count",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("i"),
    ).select(
        "token", "exact_count", "i",
        F.expr(_cms_cell("token", "i", "spark")).alias("cell"),
    )
    return (
        probe.join(F.broadcast(cms), ["i", "cell"], "inner")
        .groupBy("token", "exact_count")
        .agg(F.min("c").alias("cms_estimate"))
    )


def append_batch_sketch(batch_docs: DataFrame, store_path: str,
                        group_col: str, text_col: str,
                        k: int = K_DEFAULT,
                        batch_id: int | None = None) -> None:
    """Continuous ingest: append one micro-batch's per-group kept set
    (at most k rows per group per batch) to a parquet sketch store.

    Unlike the band/IVF stores, a KMV store needs NO batch-id
    overwrite discipline for correctness: the merge is a set union,
    so an at-least-once retry that appends the same kept set twice
    changes nothing after the merged read's distinct — the store is
    idempotent under duplicates BY CONSTRUCTION (pinned in
    tests/test_sketches.py). ``batch_id`` is recorded for
    observability only."""
    kept = kept_values(
        token_hashes(batch_docs, group_col, text_col), k)
    (kept.withColumn(
        "batch_id",
        F.lit(-1 if batch_id is None else int(batch_id)).cast("bigint"))
     .write.mode("append").parquet(store_path))


def merged_store_sketch(spark, store_path: str,
                        k: int = K_DEFAULT) -> DataFrame:
    """Read a sketch store and merge all epochs: per-group k smallest
    DISTINCT hashes across every appended kept set = exactly the
    sketch of everything ever streamed in (merge theorem), regardless
    of batch boundaries or retries. The store read is k rows per
    group per batch — the merge never touches the original corpus."""
    kept = spark.read.parquet(store_path).select("grp", "h")
    return kmv_sketch(kept.distinct(), k)


def merge_sketches(kept: DataFrame, k: int = K_DEFAULT) -> DataFrame:
    """Union estimate from per-group sketches alone: the k smallest
    DISTINCT hashes across all groups' kept sets are exactly the union
    set's k minima (every union minimum is a minimum of its own group,
    hence present in that group's sketch). One row:
    (n_kept, kth_min_hash, est_distinct)."""
    merged = (
        kept.select("h").distinct()
        .orderBy("h").limit(k)  # global k-min: TakeOrderedAndProject
    )
    return merged.agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.max("h").alias("kth_min_hash"),
    ).select("n_kept", "kth_min_hash", _estimate(k).alias("est_distinct"))


# ---------------------------------------------------------------------------
# Bloom filter: the membership sketch (completes the tier: KMV =
# cardinality, CMS = frequency, Bloom = membership)
# ---------------------------------------------------------------------------

BLOOM_LOG2_BITS = 16  # m = 65,536 bits packed into 1,024 BIGINT words
BLOOM_K = 3  # hash functions per element


def _bloom_pos(gram_expr: str, i_expr: str, dialect: str) -> str:
    """Bit position for hash ``i`` of a gram: the portable 32-bit hash
    of 'b<i>:gram', mod the power-of-two filter size — nonnegative in
    both engines (same seeding idiom as the CMS cells)."""
    if dialect == "spark":
        seeded = f"concat('b', CAST({i_expr} AS STRING), ':', {gram_expr})"
    else:
        seeded = f"('b' || CAST({i_expr} AS VARCHAR) || ':' || {gram_expr})"
    return f"({T.hash32(seeded, dialect)} % {1 << BLOOM_LOG2_BITS})"


def bloom_bits(grams: DataFrame, gram_col: str = "gram") -> DataFrame:
    """Build the filter from a gram set: ``(word, mask)`` — the m-bit
    array packed as BIGINT words, each word the BIT_OR of its members'
    bits. ONE aggregate whose shuffle is bounded at 2^(log2_bits-6)
    rows per upstream partition by partial aggregation (bit_or is the
    merge, exactly like the CMS counter sum) — and unlike the exact
    broadcast gram set, the built filter is FIXED-SIZE (8 KiB here)
    no matter how large the member set grows. Engine-exact: bit
    positions are md5-derived integers, masks are deterministic
    BIGINT bit patterns (bit 63 lands in the sign bit identically in
    both engines' two's complement)."""
    pos = _bloom_pos(gram_col, "i", "spark")
    return (
        grams.select(
            F.col(gram_col).alias("gram"),
            F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("i"),
        )
        .select(
            F.expr(f"{pos} DIV 64").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("mask"))
    )


def bloom_hits(
    probe: DataFrame, bits: DataFrame,
    id_col: str = "id", gram_col: str = "gram",
) -> DataFrame:
    """Probe per-id gram rows against a built filter: ``(id, n_grams,
    n_bloom_hits)`` where a gram hits when ALL its k bits are set — a
    superset of exact membership with the classic one-sided FPR
    (~(1 - e^(-kn/m))^k). The filter side broadcasts at its fixed 8
    KiB; the probe side never shuffles for the join."""
    pos = _bloom_pos(gram_col, "i", "spark")
    probed = (
        probe.select(
            F.col(id_col).alias("id"),
            F.col(gram_col).alias("gram"),
            F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("i"),
        )
        .select(
            "id", "gram",
            F.expr(f"{pos} DIV 64").alias("word"),
            F.expr(f"CAST({pos} % 64 AS INT)").alias("b"),
        )
        .join(F.broadcast(bits), "word", "left")
        .select(
            "id", "gram",
            F.expr(
                "CASE WHEN mask IS NULL THEN 0"
                " ELSE shiftright(mask, b) & 1 END"
            ).alias("is_set"),
        )
    )
    # min, not sum == k: a probe that repeats an (id, gram) row
    # doubles the exploded positions, and a count-based test would
    # turn a genuine member into a miss — a false NEGATIVE, the one
    # error class a Bloom filter must never produce
    per_gram = probed.groupBy("id", "gram").agg(
        (F.min("is_set") == 1).cast("int").alias("passed")
    )
    return per_gram.groupBy("id").agg(
        F.count("*").cast("bigint").alias("n_grams"),
        F.sum("passed").cast("bigint").alias("n_bloom_hits"),
    )


def append_batch_bloom(grams: DataFrame, store_path: str,
                       gram_col: str = "gram",
                       batch_id: int | None = None) -> None:
    """Continuous ingest for the membership filter: append one
    micro-batch's packed mask words (at most 2^(log2_bits-6) rows per
    batch) to a parquet store. Like the KMV store — and unlike the
    band/IVF stores — NO batch-id overwrite discipline is needed:
    the merge is BIT_OR, which is idempotent, so an at-least-once
    retry that appends the same masks twice changes nothing after the
    merged read (pinned in tests/test_sketches.py). ``batch_id`` is
    recorded for observability only."""
    bits = bloom_bits(grams, gram_col)
    (bits.withColumn(
        "batch_id",
        F.lit(-1 if batch_id is None else int(batch_id)).cast("bigint"))
     .write.mode("append").parquet(store_path))


def merged_store_bloom(spark, store_path: str) -> DataFrame:
    """Read a bloom store and merge all epochs: BIT_OR per word across
    every appended batch = exactly the filter of everything ever
    streamed in, regardless of batch boundaries, retries, or append
    order. The merged read touches mask words only — never the
    member sets."""
    return (
        spark.read.parquet(store_path)
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("mask"))
    )
