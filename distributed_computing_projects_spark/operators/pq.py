"""Product quantization (PQ) ANN: trained sub-codebooks, compact
codes, and asymmetric-distance (ADC) top-k — oracle-exact.

Why PQ at 100 TB: a 64-dim float32 embedding is 256 bytes; its PQ code
is ``M_SUB`` small ints (8 here — a 32x compression), so the ADC scan
that ranks the whole corpus streams codes instead of vectors and the
query's distance table rides INSIDE the scan expression (baked
literals — no join, no shuffle, no Python). This is the memory-bound
at-scale ANN layout (Jégou et al., "Product Quantization for Nearest
Neighbor Search", IEEE TPAMI 2011); composed with the IVF coarse
quantizer (:func:`ivfpq_topk`) it is the standard IVF-PQ index.

Training: the embedding splits into ``M_SUB`` contiguous subspaces of
``SUB_DIM`` dims; each subspace gets its own ``K_SUB``-centroid
codebook via the SAME sample-bounded, pinned-fold Lloyd machinery as
the IVF coarse trainer (operators/ivf_train.py) — deterministic
hash-seeded init, ``N_ITERS`` assignment/update rounds on the
``id % TRAIN_SAMPLE_MOD`` sample, per-(subspace, cell) means as
id-sorted left-to-right double folds. All subspaces train in ONE
Spark job per round (posexplode over the M sub-slices), and the
per-round driver collect is at most ``M_SUB * K_SUB`` rows (64) —
bounded by the codebook, never by data.

Oracle exactness: every float step is a pinned sequential double fold
(functions/text.py conventions), so DuckDB replays the whole run —
training (:func:`oracle_ctes`), corpus encoding, the query's distance
table, and the ADC sum (``list_reduce`` over ``ORDER BY m``) —
bit-for-bit. Ties in every argmin go to the lower cell id in both
engines.

Reference parity note: the reference has no ANN surface at all; this
is BASELINE.json scale-extension surface (SURVEY.md LLM-pipeline
operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from distributed_computing_projects_spark.functions import text as T
from distributed_computing_projects_spark.operators import similarity as S
from distributed_computing_projects_spark.operators.ivf_train import (
    TRAIN_SAMPLE_MOD,
    _py_dot,
    _py_sq_norm,
    _sum_fold,
)

M_SUB = 8                      # subspaces
SUB_DIM = T.EMBEDDING_DIM // M_SUB
K_SUB = 8                      # sub-centroids per subspace (3-bit codes)
N_ITERS = 2


# deterministic hash-seeded init, the PQ analogue of
# similarity.IVF_CENTROIDS (not normalized: sub-vectors aren't unit)
PQ_INIT = [
    [
        [((T._h32(f"pq-{m}-{k}-{j}") % 2001) - 1000) / 1000.0
         for j in range(SUB_DIM)]
        for k in range(K_SUB)
    ]
    for m in range(M_SUB)
]


def _dbl(v: float) -> str:
    """A float literal BOTH engines parse directly as DOUBLE. Bare
    17-digit decimals parse as DECIMAL in DuckDB, and its
    DECIMAL(17,16) -> DOUBLE conversion is not correctly rounded (the
    integer mantissa exceeds 2^53), losing the last ulp — measured on
    the ADC distance table. Exponent notation forces the string ->
    double path, which is correctly rounded in both engines."""
    s = repr(float(v))
    return s if "e" in s or "E" in s else s + "E0"


def _dbl_array(vals: list[float], dialect: str) -> str:
    body = ", ".join(_dbl(v) for v in vals)
    return f"array({body})" if dialect == "spark" else f"[{body}]"


def _slice(vec_col: str, m: int, dialect: str) -> str:
    """Subspace ``m``'s contiguous slice of the embedding."""
    lo = m * SUB_DIM + 1
    if dialect == "spark":
        return f"slice({vec_col}, {lo}, {SUB_DIM})"
    return f"list_slice({vec_col}, {lo}, {lo + SUB_DIM - 1})"


def assign_sub_expr(
    vec_col: str, m: int,
    cents_m: list[tuple[int, list[float]]], dialect: str
) -> str:
    """argmin sub-cell for subspace ``m`` as a static expression with
    baked literals: score = |c|^2 - 2<v_m, c> (|v_m|^2 is common),
    first minimum wins — lower cell id on ties, matching the oracle's
    ORDER BY (score, cell)."""
    sv = _slice(vec_col, m, dialect)
    scores, ids = [], []
    for cell, cent in sorted(cents_m):
        c2 = _py_sq_norm(cent)
        lit = _dbl_array(cent, dialect)
        scores.append(f"({_dbl(c2)} - 2 * {T.dot(sv, lit, dialect)})")
        ids.append(str(cell))
    if dialect == "spark":
        arr = f"array({', '.join(scores)})"
        idl = f"array({', '.join(ids)})"
        return (
            f"element_at({idl}, CAST(transform(array({arr}),"
            f" A -> array_position(A, array_min(A)))[0] AS INT))"
        )
    arr = f"[{', '.join(scores)}]"
    idl = f"[{', '.join(ids)}]"
    return (
        f"list_extract({idl}, list_transform([{arr}],"
        f" A -> list_position(A, list_min(A)))[1])"
    )


def train(
    spark,
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_iters: int = N_ITERS,
    sample_mod: int = TRAIN_SAMPLE_MOD,
) -> dict[int, list[tuple[int, list[float]]]]:
    """Per-subspace Lloyd training on the deterministic sample; all
    ``M_SUB`` subspaces in one job per round. Returns
    ``{m: sorted (cell, centroid) pairs}`` (sub-cells that lost every
    sample member drop out, exactly like the coarse trainer)."""
    sample = emb.filter(F.col(id_col) % sample_mod == 0).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    cents: dict[int, list[tuple[int, list[float]]]] | None = None
    for it in range(n_iters):
        subs = []
        for m in range(M_SUB):
            cm = (
                [(k, PQ_INIT[m][k]) for k in range(K_SUB)]
                if cents is None else cents[m]
            )
            subs.append(F.struct(
                F.expr(assign_sub_expr("v", m, cm, "spark")).alias("cell"),
                F.expr(_slice("v", m, "spark")).alias("sv"),
            ))
        ex = sample.select(
            "id", F.posexplode(F.array(*subs)).alias("m", "s")
        )
        grouped = (
            ex.groupBy("m", F.col("s.cell").alias("cell"))
            .agg(
                F.count("*").alias("n"),
                F.sort_array(F.collect_list(
                    F.struct(F.col("id"), F.col("s.sv").alias("v"))
                )).alias("arr"),
            )
        )
        rows = grouped.select(
            "m", "cell", "n",
            *[F.expr(_sum_fold(j, "spark")).alias(f"s{j}")
              for j in range(SUB_DIM)],
        ).collect()
        cents = {m: [] for m in range(M_SUB)}
        for r in rows:
            cents[int(r["m"])].append(
                (int(r["cell"]),
                 [r[f"s{j}"] / r["n"] for j in range(SUB_DIM)])
            )
        for m in cents:
            cents[m].sort()
    return cents


def encode_expr(
    vec_col: str,
    cents: dict[int, list[tuple[int, list[float]]]],
    dialect: str,
) -> str:
    """The vector's PQ code as an array of ``M_SUB`` sub-cell ids —
    narrow codegen over baked codebook literals, the full-corpus
    encode path (at scale this column is what gets STORED: ~M bytes
    per vector against 4*dim for the raw floats)."""
    parts = [assign_sub_expr(vec_col, m, cents[m], dialect)
             for m in range(M_SUB)]
    if dialect == "spark":
        return f"array({', '.join(parts)})"
    return f"[{', '.join(parts)}]"


def adc_lut(
    query_vec: list[float],
    cents: dict[int, list[tuple[int, list[float]]]],
) -> list[float]:
    """Flat ``M_SUB * K_SUB`` asymmetric-distance table:
    ``lut[m * K_SUB + cell] = |c|^2 - 2<q_m, c> + |q_m|^2`` (the full
    squared L2 between the query's sub-vector and the sub-centroid).
    Dead sub-cells keep a 0.0 placeholder — they never appear in any
    code, so the slot is never read. Python doubles with the same
    left-to-right folds as the SQL replay, so the table is
    bit-identical to the oracle's."""
    q = [float(x) for x in query_vec]
    lut = [0.0] * (M_SUB * K_SUB)
    for m in range(M_SUB):
        qm = q[m * SUB_DIM:(m + 1) * SUB_DIM]
        q2 = _py_sq_norm(qm)
        for cell, cent in cents[m]:
            lut[m * K_SUB + cell] = (
                _py_sq_norm(cent) - 2 * _py_dot(qm, cent) + q2
            )
    return lut


def adc_dist_expr(
    vec_col: str,
    query_vec: list[float],
    cents: dict[int, list[tuple[int, list[float]]]],
) -> str:
    """Spark expression: encode the vector and sum its sub-distances
    from the baked LUT — one narrow expression, no join, no shuffle,
    no Python. Fold order is m = 0..M_SUB-1 left-to-right from 0.0
    (the engine-shared convention of functions/text.py)."""
    codes = encode_expr(vec_col, cents, "spark")
    lut = _dbl_array(adc_lut(query_vec, cents), "spark")
    return (
        f"aggregate(transform({codes},"
        f" (c, m) -> element_at({lut}, m * {K_SUB} + c + 1)),"
        f" CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def pq_topk(
    spark,
    emb: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str,
    vec_col: str,
    centroids: dict[int, list[tuple[int, list[float]]]] | None = None,
) -> DataFrame:
    """Exhaustive PQ-ADC top-k: train (or take ``centroids``), rank
    every vector by the ADC approximation, smallest distance first
    (ties to the lower id). The scan reads one column and evaluates
    one codegen expression — the memory-bound shape PQ exists for."""
    if centroids is None:
        centroids = train(spark, emb, id_col, vec_col)
    return (
        emb.select(
            F.col(id_col).alias("id"),
            F.expr(adc_dist_expr(vec_col, query_vec, centroids))
            .alias("adc_dist"),
        )
        .orderBy(F.asc("adc_dist"), F.asc("id"))
        .limit(k)
    )


def ivfpq_topk(
    spark,
    emb: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str,
    vec_col: str,
    probes: int = 2,
    centroids: dict[int, list[tuple[int, list[float]]]] | None = None,
) -> DataFrame:
    """IVF-PQ: the fixed coarse quantizer prunes the corpus to the
    query's ``probes`` nearest cells (partition-prunable at scale —
    same cell column the IVF store partitions by), then PQ-ADC ranks
    only the survivors. THE standard composed layout for billion-scale
    ANN: the coarse index bounds the scan, the codes bound the
    memory."""
    if centroids is None:
        centroids = train(spark, emb, id_col, vec_col)
    cells = S.ivf_cells([float(x) for x in query_vec], probes)
    pruned = emb.filter(
        F.expr(S.ivf_cell_expr(vec_col, "spark")).isin(cells)
    )
    return (
        pruned.select(
            F.col(id_col).alias("id"),
            F.expr(adc_dist_expr(vec_col, query_vec, centroids))
            .alias("adc_dist"),
        )
        .orderBy(F.asc("adc_dist"), F.asc("id"))
        .limit(k)
    )


# ------------------------------------------------------------- oracle


def _values_init() -> str:
    # CAST to DOUBLE[]: DuckDB types bare float literals in VALUES as
    # DECIMAL, and DECIMAL-mixed arithmetic rounds differently in the
    # last ulp than pure-double arithmetic (measured on the LUT sums)
    rows = []
    for m in range(M_SUB):
        for k in range(K_SUB):
            lit = _dbl_array(PQ_INIT[m][k], "duck")
            rows.append(f"({m}, {k}, {lit})")
    return ", ".join(rows)


def _values_query(query_vec: list[float]) -> str:
    q = [float(x) for x in query_vec]
    rows = []
    for m in range(M_SUB):
        qm = q[m * SUB_DIM:(m + 1) * SUB_DIM]
        lit = _dbl_array(qm, "duck")
        rows.append(f"({m}, {lit}, {_dbl(_py_sq_norm(qm))})")
    return ", ".join(rows)


def oracle_ctes(
    query_vec: list[float],
    sample_mod: int = TRAIN_SAMPLE_MOD,
    n_iters: int = N_ITERS,
    where: str = "TRUE",
) -> str:
    """DuckDB CTE chain replaying the full PQ run: per-subspace
    training (same sample, same rounds, same (score, cell) tie-break,
    pinned-fold means), corpus encoding restricted to ``where`` (the
    IVF-PQ coarse filter slots in here), the query's distance table,
    and the ADC sum as a ``list_reduce`` over ``ORDER BY m``. Exposes
    ``pqadc(id, dist)``."""
    folds = ", ".join(_sum_fold(j, "duck") for j in range(SUB_DIM))
    score = (
        f"({T.sq_norm('c.cent', 'duck')}"
        f" - 2 * {T.dot('s.sv', 'c.cent', 'duck')})"
    )
    parts = [
        f"pqsub AS (SELECT vec_id AS id, m,"
        f" list_slice(embedding, m * {SUB_DIM} + 1,"
        f" (m + 1) * {SUB_DIM}) AS sv"
        f" FROM embeddings,"
        f" (SELECT unnest(generate_series(0, {M_SUB - 1})) AS m)"
        f" WHERE vec_id % {sample_mod} = 0)",
        f"pqinit AS (SELECT * FROM (VALUES {_values_init()})"
        f" t(m, cell, cent))",
    ]
    prev = "pqinit"
    for it in range(n_iters):
        parts.append(
            f"pa{it} AS (SELECT s.id, s.m, s.sv, c.cell"
            f" FROM pqsub s JOIN {prev} c ON c.m = s.m"
            f" QUALIFY row_number() OVER (PARTITION BY s.id, s.m"
            f" ORDER BY {score}, c.cell) = 1)"
        )
        parts.append(
            f"pg{it} AS (SELECT m, cell, count(*) AS n,"
            f" list(sv ORDER BY id) AS vs FROM pa{it} GROUP BY m, cell)"
        )
        parts.append(
            f"pc{it} AS (SELECT m, cell, n,"
            f" list_transform([{folds}], x -> x / n) AS cent"
            f" FROM pg{it})"
        )
        prev = f"pc{it}"
    parts += [
        f"pqc AS (SELECT m, cell, cent FROM {prev})",
        f"pqall AS (SELECT vec_id AS id, m,"
        f" list_slice(embedding, m * {SUB_DIM} + 1,"
        f" (m + 1) * {SUB_DIM}) AS sv"
        f" FROM embeddings,"
        f" (SELECT unnest(generate_series(0, {M_SUB - 1})) AS m)"
        f" WHERE {where})",
        f"pqenc AS (SELECT s.id, s.m, c.cell"
        f" FROM pqall s JOIN pqc c ON c.m = s.m"
        f" QUALIFY row_number() OVER (PARTITION BY s.id, s.m"
        f" ORDER BY {score}, c.cell) = 1)",
        f"pqq AS (SELECT * FROM (VALUES {_values_query(query_vec)})"
        f" t(m, qv, q2))",
        f"pqlut AS (SELECT c.m, c.cell,"
        f" ({T.sq_norm('c.cent', 'duck')}"
        f" - 2 * {T.dot('q.qv', 'c.cent', 'duck')} + q.q2) AS d"
        f" FROM pqc c JOIN pqq q ON q.m = c.m)",
        "pqadc AS (SELECT e.id,"
        " list_reduce(list(l.d ORDER BY e.m), (acc, x) -> acc + x)"
        " AS dist FROM pqenc e JOIN pqlut l"
        " ON l.m = e.m AND l.cell = e.cell GROUP BY e.id)",
    ]
    return ",\n    ".join(parts)


# ------------------------------------------------- persisted store

from distributed_computing_projects_spark.operators import storemeta  # noqa: E402

STORE_KIND = "ivfpq"


def _cents_to_json(
    cents: dict[int, list[tuple[int, list[float]]]]
) -> list:
    return [[m, cell, cent] for m in sorted(cents)
            for cell, cent in cents[m]]


def _cents_from_json(rows: list) -> dict[int, list[tuple[int, list[float]]]]:
    out: dict[int, list[tuple[int, list[float]]]] = {}
    for m, cell, cent in rows:
        out.setdefault(int(m), []).append((int(cell), list(cent)))
    for m in out:
        out[m].sort()
    return out


def write_ivfpq(
    spark,
    emb: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
    centroids: dict[int, list[tuple[int, list[float]]]] | None = None,
) -> None:
    """THE 100 TB ANN layout, persisted: each vector stored as
    ``(id, codes, cell)`` — its PQ code (~M small ints, a 32x
    compression over the raw floats, which are NOT stored) —
    hive-partitioned by the fixed coarse-quantizer cell. A probe
    prunes to the query's cells (PartitionFilters) and ranks the
    survivors' CODES against the baked distance table: no vector is
    ever read at query time. The PQ codebooks ride in the ``_params``
    sidecar (storemeta discipline: a probe or epoch append can never
    use different codebooks than the ones that encoded the store)."""
    if centroids is None:
        centroids = train(spark, emb, id_col, vec_col)
    keyed = emb.select(
        F.col(id_col).alias("id"),
        F.expr(encode_expr(vec_col, centroids, "spark")).alias("codes"),
        F.expr(S.ivf_cell_expr(vec_col, "spark")).alias("cell"),
    )
    keyed.repartition("cell").write.partitionBy("cell").mode(
        "overwrite"
    ).parquet(path)
    storemeta.write_params(
        path, STORE_KIND, {"pq_centroids": _cents_to_json(centroids)}
    )


def store_centroids(path: str) -> dict[int, list[tuple[int, list[float]]]]:
    """The store's own codebooks, from its sidecar (required — an
    IVF-PQ store without codebooks cannot be probed correctly)."""
    meta = storemeta.read_params(path)
    if meta is None or meta.get("kind") != STORE_KIND:
        raise storemeta.StoreParamsError(
            f"{path!r} has no {STORE_KIND!r} sidecar"
        )
    return _cents_from_json(meta["pq_centroids"])


def append_ivfpq(emb: DataFrame, path: str, id_col: str,
                 vec_col: str) -> None:
    """Epochal ingest: encode a NEW batch with the store's OWN sidecar
    codebooks and append it partitioned by cell — same at-least-once
    contract as ``similarity.append_ivf``; :func:`compact_ivfpq_store`
    is the counterpart."""
    centroids = store_centroids(path)
    keyed = emb.select(
        F.col(id_col).alias("id"),
        F.expr(encode_expr(vec_col, centroids, "spark")).alias("codes"),
        F.expr(S.ivf_cell_expr(vec_col, "spark")).alias("cell"),
    )
    keyed.repartition("cell").write.partitionBy("cell").mode(
        "append"
    ).parquet(storemeta.data_path(path))


def compact_ivfpq_store(spark, path: str) -> tuple[int, int]:
    """Distinct-on-``id`` rewrite with the shared atomic-swap
    mechanics (``storemeta.compact_partitioned_store``)."""
    return storemeta.compact_partitioned_store(
        spark, path, STORE_KIND, "cell", ["id"]
    )


def ivfpq_topk_store(
    spark,
    path: str,
    query_vec: list[float],
    k: int,
    probes: int = 2,
) -> DataFrame:
    """Top-k ADC probe against a :func:`write_ivfpq` store: the
    query's ``probes`` nearest coarse cells become a partition filter
    (directory pruning), and the scan reads ONLY (id, codes) — the
    32x-compressed representation; distance is the baked-LUT sum over
    the stored codes, one codegen expression. Duplicate-safe under
    at-least-once appends (byte-identical rows; distinct before the
    top-k)."""
    centroids = store_centroids(path)
    cells = S.ivf_cells([float(x) for x in query_vec], probes)
    lut = _dbl_array(adc_lut(query_vec, centroids), "spark")
    dist = (
        f"aggregate(transform(codes,"
        f" (c, m) -> element_at({lut}, m * {K_SUB} + c + 1)),"
        f" CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    pruned = spark.read.parquet(storemeta.data_path(path))\
        .filter(F.col("cell").isin(cells))
    return (
        pruned.select("id", F.expr(dist).alias("adc_dist"))
        .distinct()
        .orderBy(F.asc("adc_dist"), F.asc("id"))
        .limit(k)
    )
