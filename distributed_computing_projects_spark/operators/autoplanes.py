"""Auto-sized LSH blocking: derive ``n_planes`` from the corpus size
instead of asking the caller to know the sizing rule.

``similarity.suggest_n_planes`` codifies the rule (keep expected bucket
occupancy at ``target_bucket_size``: ceil(log2(n_rows / target))); this
module wires it into the entry points a 100 TB user actually calls, so
"size the knob with the corpus" is a default, not documentation. The
derivation here (:func:`resolve_n_planes`) is the INTEGER-EXACT form of
the same rule — smallest k with 2^k * target >= n_rows, computed with
integer ceil-division + bit length, no float log2 — because the driver
oracle mirrors it in SQL (``length(bin(...))``) and both engines must
pick the identical plane count for the differential hash to hold.
Equality with the float form is pinned by ``tests/test_autoplanes.py``.

Cost of ``auto``: one ``df.count()`` — on a parquet source the scan
decodes no column data (the count comes from row-group metadata), and
at scale the row count is usually already in the
catalog/metastore, in which case call :func:`resolve_n_planes` with it
directly and skip the job. The count is taken BEFORE blocking, so the
derived value is deterministic for a given corpus.

Buckets nest as planes are added (plane p depends only on p — see
``functions/text.lsh_bucket``), so re-deriving on a grown corpus
REFINES the existing bucketing rather than reshuffling it; a store
written by :func:`write_bucketed_auto` records its plane count in the
returned value and can be probed with the same ``n_planes``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from distributed_computing_projects_spark.functions import text as T
from distributed_computing_projects_spark.operators import similarity as S
from distributed_computing_projects_spark.operators import storemeta

DEFAULT_TARGET_BUCKET = 1024

# Plane-index stride between band-OR hash tables: table t draws its
# planes from [t*TABLE_STRIDE, t*TABLE_STRIDE + n_planes). A fixed
# stride (not t*n_planes) keeps each table's plane set independent of
# the derived plane count, so growing n_planes REFINES every table's
# bucketing in place (prefix nesting per table) and a differential
# oracle can compute the full stride-wide bucket statically and mask
# to the derived count. 24 bits bounds n_planes at 2^24 buckets per
# table — far past any sane target occupancy.
TABLE_STRIDE = 24


def resolve_n_planes(
    n_rows: int, target_bucket_size: int = DEFAULT_TARGET_BUCKET
) -> int:
    """Integer-exact ``suggest_n_planes``: the smallest k >= 1 with
    2^k * target_bucket_size >= n_rows. Since 2^k is an integer,
    2^k >= n/t iff 2^k >= ceil(n/t), so k = bit_length(ceil(n/t) - 1)
    — no float log2, hence no 1-ulp ceil() hazards at power-of-two
    boundaries and an exact SQL mirror via ``length(bin(...))``."""
    if n_rows <= target_bucket_size:
        return 1
    ceil_div = -(-n_rows // target_bucket_size)
    return max(1, (ceil_div - 1).bit_length())


def auto_n_planes(
    df: DataFrame, target_bucket_size: int = DEFAULT_TARGET_BUCKET
) -> int:
    """Derive the plane count from the DataFrame's row count (a
    column-pruned count job on a parquet source; see module doc)."""
    return resolve_n_planes(df.count(), target_bucket_size)


def knn_join_auto(
    emb: DataFrame, id_col: str, vec_col: str, k: int,
    target_bucket_size: int = DEFAULT_TARGET_BUCKET,
    persist: bool = True,
) -> DataFrame:
    """:func:`similarity.knn_join` with ``n_planes`` derived from the
    corpus size — the corpus-wide KNN a user should reach for when they
    do not want to hold the sizing rule in their head."""
    n = auto_n_planes(emb, target_bucket_size)
    return S.knn_join(emb, id_col, vec_col, k, n_planes=n, persist=persist)


def lsh_bucket_table(
    vec_col: str, dialect: str, n_planes: int, table: int,
    stride: int = TABLE_STRIDE,
) -> str:
    """Sign-bit bucket of hash table ``table``: same construction as
    ``functions.text.lsh_bucket`` but over planes
    [table*stride, table*stride + n_planes). Table 0 with the default
    stride IS the standard bucket (bit-identical), so single-table
    callers and band-OR callers agree on table 0."""
    if n_planes > stride:
        raise ValueError(f"n_planes {n_planes} exceeds table stride {stride}")
    off = table * stride
    bits = [
        f"(CASE WHEN {T.plane_dot(vec_col, off + p, dialect)} >= 0"
        f" THEN {2 ** p} ELSE 0 END)"
        for p in range(n_planes)
    ]
    return "(" + " + ".join(bits) + ")"


def knn_join_tables(
    emb: DataFrame, id_col: str, vec_col: str, k: int,
    n_planes: int, n_tables: int,
    persist: bool = True,
) -> DataFrame:
    """Band-OR KNN self-join: ``n_tables`` INDEPENDENT hyperplane hash
    tables (disjoint plane sets, :func:`lsh_bucket_table`); a pair is a
    candidate if it collides in ANY table — the MinHash-bands trick
    applied to hyperplane LSH. Per-pair collision probability rises
    from p^n (one table) to 1-(1-p^n)^L, which is what rescues recall
    when neighbours sit at wide angles (p = 1 - θ/π per plane); the
    candidate volume rises at most L-fold, so the blocked-join scale
    argument is unchanged (equi-join on (table, bucket), never
    all-pairs — L·N²/2^n_planes candidates).

    Shape mirrors ``dedup.minhash_lsh_pairs``: ONE scan explodes each
    vector to L (table, bucket) rows, the self-join is an equi-join on
    (table, bucket), cosine is computed per collision and the pair list
    is distinct'd on (id, neighbour, cosine) — the double is a pure
    function of the pair, so cross-table duplicates collapse — then one
    rank window. ``persist`` caches the exploded frame (same two-sided
    self-join rationale and opt-out as ``similarity.knn_join``).

    Output schema = ``similarity.knn_join`` (id, neighbour_id, cosine,
    rank); ``knn_join_tables(.., n_tables=1)`` ≡ ``knn_join`` at the
    same plane count. Input is ``spread()`` for the same
    compute-dense-probe reason as ``knn_join``.
    """
    from distributed_computing_projects_spark.operators.spread import spread

    emb = spread(emb)
    tbls = F.array(*[
        F.struct(
            F.lit(t).alias("tbl"),
            F.expr(lsh_bucket_table(vec_col, "spark", n_planes, t))
            .alias("bucket"),
        )
        for t in range(n_tables)
    ])
    b = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.expr(T.sq_norm(vec_col, "spark")).alias("nrm"),
        F.explode(tbls).alias("tb"),
    ).select("id", "v", "nrm",
             F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    if persist:
        b = b.persist()
    a, bb = b.alias("a"), b.alias("b")
    cos = T.cosine(T.dot("a.v", "b.v", "spark"), "a.nrm", "b.nrm")
    pairs = (
        a.join(bb, (F.col("a.tbl") == F.col("b.tbl"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") != F.col("b.id")))
        .select(
            F.col("a.id").alias("id"),
            F.col("b.id").alias("neighbour_id"),
            F.expr(cos).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("cosine"), F.asc("neighbour_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def knn_join_tables_auto(
    emb: DataFrame, id_col: str, vec_col: str, k: int, n_tables: int,
    target_bucket_size: int = DEFAULT_TARGET_BUCKET,
    persist: bool = True,
) -> DataFrame:
    """:func:`knn_join_tables` with ``n_planes`` derived from the
    corpus size (same rule as :func:`knn_join_auto`; per-table bucket
    occupancy is what the rule controls, so the derivation is
    unchanged — candidate volume scales with ``n_tables``).

    The derived count is clamped to ``TABLE_STRIDE``: past
    ~target_bucket_size * 2^24 rows the per-table plane budget is
    exhausted, and the right trade is bigger buckets (more per-bucket
    work) over a hard failure deep in SQL generation — callers who
    want more planes than the stride allow must widen TABLE_STRIDE
    explicitly (a store-layout change)."""
    n = min(auto_n_planes(emb, target_bucket_size), TABLE_STRIDE)
    return knn_join_tables(emb, id_col, vec_col, k, n, n_tables,
                           persist=persist)


def write_bucketed_auto(
    emb: DataFrame, path: str, id_col: str, vec_col: str,
    target_bucket_size: int = DEFAULT_TARGET_BUCKET,
) -> int:
    """:func:`similarity.write_bucketed` with ``n_planes`` derived at
    write time (the row count is on hand exactly once — when the store
    is built). Returns the derived plane count for logging; probes
    (``lsh_topk_bucketed``) resolve it from the store's ``_params``
    sidecar, so nothing needs to carry the value out-of-band."""
    n = auto_n_planes(emb, target_bucket_size)
    S.write_bucketed(emb, path, id_col, vec_col, n_planes=n)
    return n


def query_bucket_table(
    query_vec: list[float], n_planes: int, table: int,
    stride: int = TABLE_STRIDE,
) -> int:
    """Driver-side bucket of the query vector in hash table ``table``
    (same sign-bit formula as :func:`lsh_bucket_table`; plain Python
    floats are IEEE doubles, so it agrees with the column expression)."""
    off = table * stride
    bucket = 0
    for p in range(n_planes):
        d = sum(float(x) * c for x, c in zip(query_vec, T.hyperplane(off + p)))
        if d >= 0:
            bucket += 1 << p
    return bucket


def probe_buckets_table(
    query_vec: list[float], probe_hamming: int, n_planes: int, table: int,
    stride: int = TABLE_STRIDE,
) -> list[int]:
    """Multi-probe IN-list for one table: all buckets within
    ``probe_hamming`` sign-bits of the query's bucket in that table."""
    from itertools import combinations

    qb = query_bucket_table(query_vec, n_planes, table, stride)
    out = []
    for h in range(probe_hamming + 1):
        for flips in combinations(range(n_planes), h):
            b = qb
            for p in flips:
                b ^= 1 << p
            out.append(b)
    return sorted(out)


def _tables_rows(emb: DataFrame, id_col: str, vec_col: str,
                 n_planes: int, n_tables: int) -> DataFrame:
    """(id, v, tbl, bucket) — one row per (vector, table), the band-OR
    store's row shape, shared by whole-write and epoch append."""
    tbls = F.array(*[
        F.struct(
            F.lit(t).alias("tbl"),
            F.expr(lsh_bucket_table(vec_col, "spark", n_planes, t))
            .alias("bucket"),
        )
        for t in range(n_tables)
    ])
    return emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.explode(tbls).alias("tb"),
    ).select("id", "v", F.col("tb.tbl").alias("tbl"),
             F.col("tb.bucket").alias("bucket"))


def write_bucketed_tables(
    emb: DataFrame, path: str, id_col: str, vec_col: str,
    n_planes: int, n_tables: int,
) -> None:
    """Band-OR probe store: one row per (vector, table), hive-
    partitioned by (tbl, bucket) — ``n_tables`` directories of
    2^n_planes buckets each. Storage is L× the single-table store
    (:func:`similarity.write_bucketed`); in exchange a fixed query's
    recall gets the 1-(1-p^n)^L band-OR lift while each probe still
    reads only partition-pruned directories. Write cost: one pass +
    one hash exchange on the partition key (one file per directory)."""
    keyed = _tables_rows(emb, id_col, vec_col, n_planes, n_tables)
    keyed.repartition("tbl", "bucket").write.partitionBy(
        "tbl", "bucket"
    ).mode("overwrite").parquet(path)
    storemeta.write_params(
        path, "lsh_tables",
        {"n_planes": n_planes, "n_tables": n_tables,
         "stride": TABLE_STRIDE},
    )


def append_bucketed_tables(emb: DataFrame, path: str, id_col: str,
                           vec_col: str) -> None:
    """Epochal ingest for the band-OR store: bucket a NEW batch with
    the store's OWN sidecar (n_planes, n_tables) across every hash
    table and append — the multi-table sibling of
    ``similarity.append_bucketed``. At-least-once under retries
    (probes are distinct; :func:`compact_tables_store` reclaims)."""
    meta = storemeta.read_params(path)
    if meta is None or meta.get("kind") != "lsh_tables":
        raise storemeta.StoreParamsError(
            f"append_bucketed_tables: {path!r} has no lsh_tables sidecar"
        )
    keyed = _tables_rows(emb, id_col, vec_col,
                         int(meta["n_planes"]), int(meta["n_tables"]))
    keyed.repartition("tbl", "bucket").write.partitionBy(
        "tbl", "bucket"
    ).mode("append").parquet(path)


def compact_tables_store(spark, path: str) -> tuple[int, int]:
    """Distinct-on-``(id, tbl)`` rewrite of a band-OR store with the
    shared atomic-swap mechanics."""
    return storemeta.compact_partitioned_store(
        spark, path, "lsh_tables", ["tbl", "bucket"], ["id", "tbl"]
    )


def lsh_topk_tables(
    spark,
    path: str,
    query_vec: list[float],
    k: int,
    n_planes: int | None = None,
    n_tables: int | None = None,
    probe_hamming: int = 0,
) -> DataFrame:
    """Top-k cosine probe against a :func:`write_bucketed_tables`
    store: the per-table probe IN-lists are enumerated driver-side and
    applied as an OR of (tbl, bucket IN ...) conjunctions over the two
    partition columns — still pure directory pruning (plan-asserted).
    A vector found by several tables is deduped on (id, cosine) before
    ranking (cosine is a pure function of the id).

    ``n_planes``/``n_tables`` default to the store's ``_params``
    sidecar (written by :func:`write_bucketed_tables`); explicit values
    raise on mismatch — wrong values probe the wrong directories
    (storemeta). The plane-index ``stride`` is sidecar-checked too:
    a store written under a different TABLE_STRIDE has entirely
    different plane sets."""
    from functools import reduce

    params = storemeta.resolve(
        path, "lsh_tables",
        {"n_planes": n_planes, "n_tables": n_tables,
         "stride": TABLE_STRIDE},
    )
    n_planes, n_tables = params["n_planes"], params["n_tables"]

    pred = reduce(
        lambda a, b: a | b,
        [
            (F.col("tbl") == t)
            & F.col("bucket").isin(
                probe_buckets_table(query_vec, probe_hamming, n_planes, t)
            )
            for t in range(n_tables)
        ],
    )
    pruned = spark.read.parquet(path).filter(pred)
    q = T._float_array_literal([float(x) for x in query_vec], "spark")
    cos = T.cosine(T.dot("v", q, "spark"), T.sq_norm("v", "spark"),
                   T.sq_norm(q, "spark"))
    return (
        pruned.select("id", F.expr(cos).alias("cosine"))
        .distinct()
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


# --------------------------------------------------- candidate accounting

def model_candidates(n_rows: int, n_planes: int, n_tables: int = 1) -> int:
    """Uniform-occupancy analytic candidate count of the bucketed
    self-join: ``n_tables * C(n_rows, 2) / 2^n_planes``. This is the
    arithmetic behind "would survive 100x": with the auto-sizer's
    ``n_planes ~ log2(N / target)``, candidates stay ~``N * target/2``
    — linear in N — at any corpus size. Real corpora exceed the
    uniform model exactly where they contain near-duplicates (the
    pairs the join EXISTS to find), so measured/model is a skew
    diagnostic, not an error bar; see :func:`measured_candidates` and
    tools/candidate_accounting.py."""
    return n_tables * (n_rows * (n_rows - 1) // 2) // (2 ** n_planes)


def measured_candidates(
    emb: DataFrame, vec_col: str, n_planes: int, n_tables: int = 1
) -> int:
    """EXACT candidate-pair count of the bucketed KNN self-join
    without running the join: per table, bucket the corpus with the
    same sign-bit expression the join uses (:func:`lsh_bucket_table`,
    table 0 == the single-table bucket) and sum ``C(n_b, 2)`` over
    buckets — one count-agg per table, no pair materialization.
    Integer DIV keeps the sum exact in long arithmetic even when
    n*(n-1) exceeds double's 2^53 integer range (a double-division
    /2 would round for buckets past ~9.4e7 rows)."""
    total = 0
    for t in range(n_tables):
        expr = lsh_bucket_table(vec_col, "spark", n_planes, t)
        row = (
            emb.groupBy(F.expr(expr).alias("bucket"))
            .count()
            .agg(
                F.sum(
                    F.expr("`count` * (`count` - 1) DIV 2")
                ).alias("c")
            )
            .collect()[0]
        )
        total += int(row.c or 0)
    return total


def measured_grouped_candidates(grouped: DataFrame, *group_cols: str) -> int:
    """Candidate-pair accounting for BANDED joins (MinHash/SimHash
    band tables): sum of ``C(n, 2)`` over ``group_cols`` groups. No
    uniform model applies — band collisions are driven by the data's
    duplicate structure, which is the point; the accounting records
    the measured growth instead."""
    row = (
        grouped.groupBy(*group_cols)
        .count()
        .agg(
            F.sum(
                # integer DIV keeps the sum exact in long arithmetic even
                # when count*(count-1) exceeds double's 2^53 integer range
                F.expr("`count` * (`count` - 1) DIV 2")
            ).alias("c")
        )
        .collect()[0]
    )
    return int(row.c or 0)
