"""Similarity-search / ANN query family: brute-force, hyperplane-LSH and IVF top-k, recall measurement, corpus-wide KNN self-join (single-table, auto-sized, band-OR), label diagnostics, and the trained-IVF quantizer queries. Split from extensions.py (round 7); shared fragments in ext_fragments."""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from distributed_computing_projects_spark.functions import text as T
from distributed_computing_projects_spark.operators import dedup as D
from distributed_computing_projects_spark.operators import multimodal as M
from distributed_computing_projects_spark.operators import sampling as SP
from distributed_computing_projects_spark.operators import similarity as S
from distributed_computing_projects_spark.operators import textstats as X
from distributed_computing_projects_spark.queries import query
from distributed_computing_projects_spark.sources.registry import load_table
from distributed_computing_projects_spark.queries.ext_fragments import (
    _BAND_SELECTS,
    _BAND_SELECTS_SRC,
    _CHUNK_STEP,
    _ECHO_UNION,
    _HASHES_D,
    _INCR_EPOCHS_ORACLE,
    _INCR_ORACLE,
    _LSH_CTES,
    _N_EQ_D,
    _SH_D,
    _SIG_D,
    _THASHES_D,
    _TOKS_D,
    ANN_K,
    ANN_PROBE_HAMMING,
    ANN_QUERY_VEC,
    CHUNK_OVERLAP,
    CHUNK_TOKENS,
    COSINE_THRESHOLD,
    ECHO_EVERY,
    ECHO_OFFSET,
    EPOCH2_SOURCE,
    GATE_MIN_DISTINCT,
    GATE_MIN_TOKENS,
    INCR_BATCH_SOURCE,
    JACCARD_THRESHOLD,
    MINHASH_THRESHOLD,
    SIMHASH_MAX_HAMMING,
)
from distributed_computing_projects_spark.operators import ivf_train as IVT


_QLIT_D = S._query_literal(ANN_QUERY_VEC, "duck")


_COS_Q_D = T.cosine(
    T.dot("embedding", _QLIT_D, "duck"),
    T.sq_norm("embedding", "duck"),
    T.sq_norm(_QLIT_D, "duck"),
)


@query(
    "ann_bruteforce_topk",
    oracle=f"""
    SELECT vec_id AS id, {_COS_Q_D} AS cosine
    FROM embeddings
    ORDER BY cosine DESC, id LIMIT {ANN_K}
    """,
    headline=True,
    doc="Exact cosine top-k vs a fixed query vector — the ANN recall "
        "baseline; TakeOrderedAndProject, no global sort.",
)
def q_ann_bruteforce_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(emb, ANN_QUERY_VEC, ANN_K, "vec_id", "embedding")


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH b AS (
      SELECT vec_id AS id, embedding,
             {T.lsh_bucket('embedding', 'duck')} AS bucket
      FROM embeddings)
    SELECT id, {_COS_Q_D} AS cosine
    FROM b
    WHERE {T.hamming('bucket', str(S.query_bucket(ANN_QUERY_VEC)), 'duck')}
          <= {ANN_PROBE_HAMMING}
    ORDER BY cosine DESC, id LIMIT {ANN_K}
    """,
    doc="LSH-bucketed ANN: multi-probe hyperplane buckets prune the "
        "scan; at scale the bucket is a partition key -> partition "
        "pruning instead of a full scan.",
)
def q_ann_lsh_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return S.lsh_topk(
        emb, ANN_QUERY_VEC, ANN_K, "vec_id", "embedding",
        probe_hamming=ANN_PROBE_HAMMING,
    )


@query(
    "ann_lsh_incremental_topk",
    oracle=f"""
    WITH b AS (
      SELECT vec_id AS id, embedding,
             {T.lsh_bucket('embedding', 'duck')} AS bucket
      FROM embeddings)
    SELECT id, {_COS_Q_D} AS cosine
    FROM b
    WHERE {T.hamming('bucket', str(S.query_bucket(ANN_QUERY_VEC)), 'duck')}
          <= {ANN_PROBE_HAMMING}
    ORDER BY cosine DESC, id LIMIT {ANN_K}
    """,
    doc="Incremental LSH-store ingest: the corpus (vec_id % 10 != 0) "
        "is materialized bucket-partitioned (similarity.write_bucketed "
        "at the default plane count), a NEW epoch (vec_id % 10 == 0) "
        "is appended with similarity.append_bucketed — bucketed by the "
        "store's OWN sidecar n_planes — and the multi-probe pruned "
        "top-k must return exactly the full-corpus answer (the LSH "
        "sibling of ann_ivf_incremental_topk; same oracle shape as "
        "ann_lsh_topk over ALL embeddings).",
)
def q_ann_lsh_incremental_topk(spark, sf_dir):
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    epoch = emb.filter(F.col("vec_id") % 10 == 0)
    path = os.path.join(
        tempfile.gettempdir(),
        f"dcp_lshstore_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    S.write_bucketed(corpus, path, "vec_id", "embedding")
    S.append_bucketed(epoch, path, "vec_id", "embedding")
    return S.lsh_topk_bucketed(
        spark, path, ANN_QUERY_VEC, ANN_K,
        probe_hamming=ANN_PROBE_HAMMING,
    )


ANN_IVF_PROBES = 2


_IVF_CELLS = S.ivf_cells(ANN_QUERY_VEC, ANN_IVF_PROBES)


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH assigned AS (
      SELECT vec_id AS id, embedding,
             {S.ivf_cell_expr('embedding', 'duck')} AS cell
      FROM embeddings)
    SELECT id, {_COS_Q_D} AS cosine
    FROM assigned
    WHERE cell IN ({', '.join(str(c) for c in _IVF_CELLS)})
    ORDER BY cosine DESC, id LIMIT {ANN_K}
    """,
    doc="IVF-flat ANN: fixed md5-derived coarse quantizer, probe the 2 "
        "nearest inverted lists — at scale the cell is a partition key "
        "so the probe is partition pruning, not a scan.",
)
def q_ann_ivf_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        emb, ANN_QUERY_VEC, ANN_K, "vec_id", "embedding", probes=ANN_IVF_PROBES
    )


from distributed_computing_projects_spark.operators import (  # noqa: E402
    ivf_train as IVT,
)
from distributed_computing_projects_spark.queries.ext_fragments import (  # noqa: E402
    TL_ASSIGN_CTES,
    TL_CENTS,
)

_TL_PROBE_CELLS = IVT.probe_cells(ANN_QUERY_VEC, TL_CENTS, ANN_IVF_PROBES)
_COS_TLV_D = T.cosine(
    T.dot("v", T._float_array_literal(ANN_QUERY_VEC, "duck"), "duck"),
    T.sq_norm("v", "duck"),
    T.sq_norm(T._float_array_literal(ANN_QUERY_VEC, "duck"), "duck"),
)


@query(
    "ann_ivf_twolevel_topk",
    oracle=f"""
    WITH {TL_ASSIGN_CTES.strip()}
    SELECT id, {_COS_TLV_D} AS cosine
    FROM a2
    WHERE cell IN ({', '.join(str(c) for c in _TL_PROBE_CELLS)})
    ORDER BY cosine DESC, id LIMIT {ANN_K}
    """,
    doc="IVF-flat ANN with the corpus assigned through the TWO-LEVEL "
        "coarse index at sized k=64 "
        "(ivf_train.assign_cells_two_level — ~N*(1+p)*sqrt(k) scoring "
        "folds instead of a k-term codegen expression that stops "
        "compiling at production k): probe-cell selection for the "
        "query vector stays exact (k-sized, driver-side), list "
        "membership comes from the hierarchical assignment, and the "
        "oracle replays both stages from the same baked literals "
        "before re-running the probe scan.",
)
def q_ann_ivf_twolevel_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = IVT.assign_cells_two_level(
        emb.select("vec_id", "embedding"), "vec_id", "embedding",
        TL_CENTS, carry=("embedding",),
    )
    q = T._float_array_literal([float(x) for x in ANN_QUERY_VEC], "spark")
    cos = T.cosine(
        T.dot("embedding", q, "spark"),
        T.sq_norm("embedding", "spark"),
        T.sq_norm(q, "spark"),
    )
    return (
        assigned.filter(F.col("cell").isin(_TL_PROBE_CELLS))
        .select(F.col("vec_id").alias("id"), F.expr(cos).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(ANN_K)
    )


INCR_VEC_MOD = 10  # vec_id % 10 == 0 -> the "new embeddings" epoch


@query(
    "ann_ivf_incremental_topk",
    oracle=f"""
    WITH assigned AS (
      SELECT vec_id AS id, embedding,
             {S.ivf_cell_expr('embedding', 'duck')} AS cell
      FROM embeddings)
    SELECT id, {_COS_Q_D} AS cosine
    FROM assigned
    WHERE cell IN ({', '.join(str(c) for c in _IVF_CELLS)})
    ORDER BY cosine DESC, id LIMIT {ANN_K}
    """,
    doc="Incremental ANN ingest — the IVF counterpart of "
        "dedup_incremental_store: the corpus (vec_id % 10 != 0) is "
        "materialized as a cell-partitioned IVF store "
        "(similarity.write_ivf), a NEW epoch (vec_id % 10 == 0) is "
        "appended with similarity.append_ivf — assigned by the "
        "store's OWN sidecar centroids, so an epoch can never be "
        "bucketed differently than the store — and the partition-"
        "pruned probe must return exactly the full-corpus answer: "
        "the oracle assigns ALL embeddings in one pass, which only "
        "matches if the append path is equivalent to having written "
        "the store whole. Covers write -> sidecar resolve -> append "
        "-> prune -> probe end-to-end in one driver row.",
)
def q_ann_ivf_incremental_topk(spark, sf_dir):
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % INCR_VEC_MOD != 0)
    epoch = emb.filter(F.col("vec_id") % INCR_VEC_MOD == 0)
    path = os.path.join(
        tempfile.gettempdir(),
        f"dcp_ivfstore_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    S.write_ivf(corpus, path, "vec_id", "embedding")
    S.append_ivf(epoch, path, "vec_id", "embedding")
    return S.ivf_topk_partitioned(
        spark, path, ANN_QUERY_VEC, ANN_K, probes=ANN_IVF_PROBES
    )


@query(
    "ann_recall",
    oracle=f"""
    WITH exact AS (
      SELECT vec_id AS id FROM embeddings
      ORDER BY {_COS_Q_D} DESC, vec_id LIMIT {ANN_K}),
    lsh AS (
      SELECT vec_id AS id FROM embeddings
      WHERE {T.hamming(T.lsh_bucket('embedding', 'duck'),
                       str(S.query_bucket(ANN_QUERY_VEC)), 'duck')}
            <= {ANN_PROBE_HAMMING}
      ORDER BY {_COS_Q_D} DESC, vec_id LIMIT {ANN_K}),
    ivf AS (
      SELECT vec_id AS id FROM embeddings
      WHERE {S.ivf_cell_expr('embedding', 'duck')}
            IN ({', '.join(str(c) for c in _IVF_CELLS)})
      ORDER BY {_COS_Q_D} DESC, vec_id LIMIT {ANN_K})
    SELECT 'lsh' AS method, CAST(count(*) AS BIGINT) AS hits,
           CAST({ANN_K} AS BIGINT) AS k
    FROM lsh JOIN exact USING (id)
    UNION ALL
    SELECT 'ivf' AS method, CAST(count(*) AS BIGINT) AS hits,
           CAST({ANN_K} AS BIGINT) AS k
    FROM ivf JOIN exact USING (id)
    """,
    doc="Recall@k of the two approximate ANN tiers against the exact "
        "brute-force top-k at their default parameters — the measured "
        "link between the pruned scans and the recall they pay for it. "
        "Integer hit counts, so the oracle check is drift-free.",
)
def q_ann_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = S.brute_force_topk(
        emb, ANN_QUERY_VEC, ANN_K, "vec_id", "embedding"
    ).select("id")
    approx = {
        "lsh": S.lsh_topk(emb, ANN_QUERY_VEC, ANN_K, "vec_id", "embedding",
                          probe_hamming=ANN_PROBE_HAMMING),
        "ivf": S.ivf_topk(emb, ANN_QUERY_VEC, ANN_K, "vec_id", "embedding",
                          probes=ANN_IVF_PROBES),
    }
    # the exact top-k is k rows — each semi join broadcasts it; the
    # per-method scans are the same scans the underlying queries run
    parts = [
        a.select("id").join(F.broadcast(exact), "id", "left_semi")
        .agg(F.count("*").alias("hits"))
        .select(
            F.lit(m).alias("method"),
            "hits",
            F.lit(ANN_K).cast("bigint").alias("k"),
        )
        for m, a in approx.items()
    ]
    return parts[0].unionAll(parts[1])


KNN_K = 3


@query(
    "knn_join_topk",
    headline=True,
    oracle=f"""
    WITH b AS (
      SELECT vec_id AS id, embedding AS v,
             {T.lsh_bucket('embedding', 'duck')} AS bucket,
             {T.sq_norm('embedding', 'duck')} AS nrm
      FROM embeddings),
    pairs AS (
      SELECT a.id AS id, b.id AS neighbour_id,
             {T.cosine(T.dot('a.v', 'b.v', 'duck'), 'a.nrm', 'b.nrm')}
               AS cosine
      FROM b a JOIN b b ON a.bucket = b.bucket AND a.id <> b.id),
    ranked AS (
      SELECT id, neighbour_id, cosine,
             CAST(row_number() OVER (
               PARTITION BY id ORDER BY cosine DESC, neighbour_id
             ) AS BIGINT) AS rank
      FROM pairs)
    SELECT id, neighbour_id, cosine, rank FROM ranked
    WHERE rank <= {KNN_K}
    """,
    doc="Corpus-wide KNN self-join (top-3 neighbours per vector, "
        "LSH-bucket blocked): the similarity-search operator between "
        "fixed-query top-k and threshold pairs — two shuffles at any "
        "scale (bucket equi-join + rank window), never all-pairs.",
)
def q_knn_join_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return S.knn_join(emb, "vec_id", "embedding", KNN_K)


@query(
    "lsh_bucket_label_purity",
    oracle=f"""
    WITH b AS (
      SELECT label, {T.lsh_bucket('embedding', 'duck')} AS bucket
      FROM embeddings),
    counts AS (
      SELECT bucket, label, count(*) AS n FROM b GROUP BY bucket, label),
    ranked AS (
      SELECT bucket, label, n,
             row_number() OVER (PARTITION BY bucket
                                ORDER BY n DESC, label ASC) AS rn,
             CAST(sum(n) OVER (PARTITION BY bucket) AS BIGINT) AS n_vecs
      FROM counts)
    SELECT bucket, n_vecs, label AS top_label, n AS top_label_n
    FROM ranked WHERE rn = 1
    """,
    doc="ANN diagnostic over the labeled embeddings: per hyperplane-LSH "
        "bucket, its size and majority label (ties to the smaller "
        "label) — measures whether the bucketing preserves label "
        "locality. Integer-only output, so cross-engine exact; one "
        "aggregation + one window, both on (bucket,label) counts.",
)
def q_lsh_bucket_label_purity(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    counts = (
        emb.select(
            "label",
            F.expr(T.lsh_bucket("embedding", "spark")).alias("bucket"),
        )
        .groupBy("bucket", "label")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("bucket")
    ranked = counts.select(
        "bucket", "label", "n",
        F.row_number().over(
            Window.partitionBy("bucket").orderBy(F.desc("n"), F.asc("label"))
        ).alias("rn"),
        F.sum("n").over(w).alias("n_vecs"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "bucket", "n_vecs", F.col("label").alias("top_label"),
        F.col("n").alias("top_label_n"),
    )


@query(
    "knn_label_accuracy",
    oracle=f"""
    WITH b AS (
      SELECT vec_id AS id, embedding AS v, label,
             {T.lsh_bucket('embedding', 'duck')} AS bucket,
             {T.sq_norm('embedding', 'duck')} AS nrm
      FROM embeddings),
    pairs AS (
      SELECT a.id AS id, a.label AS label, b.label AS n_label,
             {T.cosine(T.dot('a.v', 'b.v', 'duck'), 'a.nrm', 'b.nrm')}
               AS cosine, b.id AS neighbour_id
      FROM b a JOIN b b ON a.bucket = b.bucket AND a.id <> b.id),
    ranked AS (
      SELECT id, label, n_label,
             row_number() OVER (
               PARTITION BY id ORDER BY cosine DESC, neighbour_id
             ) AS rank
      FROM pairs),
    votes AS (
      SELECT id, label, n_label, count(*) AS n
      FROM ranked WHERE rank <= __KNN_K__
      GROUP BY id, label, n_label),
    pred AS (
      SELECT id, label, n_label AS pred_label
      FROM votes
      QUALIFY row_number() OVER (
        PARTITION BY id ORDER BY n DESC, n_label ASC) = 1)
    SELECT label,
           CAST(sum(CASE WHEN pred_label = label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           count(*) AS n_total
    FROM pred GROUP BY label
    """.replace("__KNN_K__", str(KNN_K)),
    doc="kNN label-vote accuracy: each vector's label predicted by the "
        "majority label of its LSH-bucket k nearest neighbours (ties: "
        "smaller label), reported per true label — the retrieval-eval "
        "composition over knn_join. Integer-only output.",
)
def q_knn_label_accuracy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    knn = S.knn_join(emb, "vec_id", "embedding", KNN_K)
    lab = emb.select(F.col("vec_id").alias("id"), "label")
    nlab = emb.select(
        F.col("vec_id").alias("neighbour_id"), F.col("label").alias("n_label")
    )
    votes = (
        knn.join(nlab, "neighbour_id")
        .groupBy("id", "n_label")
        .agg(F.count("*").alias("n"))
    )
    pred = (
        votes.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy(F.desc("n"), F.asc("n_label"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("id", F.col("n_label").alias("pred_label"))
    )
    return (
        pred.join(lab, "id")
        .groupBy("label")
        .agg(
            F.sum(
                F.when(F.col("pred_label") == F.col("label"), 1).otherwise(0)
            ).cast("bigint").alias("n_correct"),
            F.count("*").alias("n_total"),
        )
    )


RECALL_KS = (1, 3, 10)


RECALL_SAMPLE_MOD = 5  # measure recall on ids ≡ 0 (mod 5): exact side is O(N²/5), not O(N²)


RECALL_TARGET_BUCKET = 64  # auto-derived planes: sf0.01 N=500 → 3 planes, sf0.1 N=2000 → 5


RECALL_N_TABLES = 4  # band-OR tables for the multi-table tier


def _knn_recall_oracle() -> str:
    from distributed_computing_projects_spark.operators import (
        autoplanes as AUTOP,
    )

    cos_ap = T.cosine(T.dot("a.v", "b.v", "duck"), "a.nrm", "b.nrm")
    max_k = max(RECALL_KS)

    def hit_cols(src: str) -> str:
        return ", ".join(
            f"CAST(coalesce(sum(CASE WHEN rl <= {k} AND re <= {k} THEN 1"
            f" END), 0) AS BIGINT) AS h{k}"
            for k in RECALL_KS
        )

    def stack(method: str, h: str) -> str:
        return " UNION ALL ".join(
            f"SELECT '{method}' AS method, CAST({k} AS BIGINT) AS k,"
            f" h{k} AS hits, CAST({k} AS BIGINT) * nq AS total"
            f" FROM {h}, nq"
            for k in RECALL_KS
        )

    # full stride-wide bucket per table, statically generated; the
    # derived plane count masks it (prefix nesting within each table)
    tbl_buckets = ", ".join(
        f"{AUTOP.lsh_bucket_table('embedding', 'duck', AUTOP.TABLE_STRIDE, t)}"
        f" AS bt{t}"
        for t in range(RECALL_N_TABLES)
    )
    tbl_union = " UNION ALL ".join(
        f"SELECT id, v, nrm, {t} AS t, bt{t} AS braw FROM base"
        for t in range(RECALL_N_TABLES)
    )
    return f"""
    WITH nrows AS (SELECT count(*) AS c FROM embeddings),
    np AS (
      SELECT CASE WHEN c <= {RECALL_TARGET_BUCKET} THEN 1
             ELSE greatest(1, length(bin(CAST(
               (c + {RECALL_TARGET_BUCKET - 1}) // {RECALL_TARGET_BUCKET} - 1
               AS BIGINT)))) END AS n
      FROM nrows),
    base AS (
      SELECT vec_id AS id, embedding AS v,
             {T.sq_norm('embedding', 'duck')} AS nrm,
             {tbl_buckets}
      FROM embeddings),
    bk AS (
      SELECT id, v, nrm,
             bt0 % (CAST(1 AS BIGINT) << (SELECT n FROM np)) AS bucket
      FROM base),
    bkt AS (
      SELECT id, v, nrm, t,
             braw % (CAST(1 AS BIGINT) << (SELECT n FROM np)) AS bucket
      FROM ({tbl_union})),
    ap AS (
      SELECT a.id, b.id AS nb,
             row_number() OVER (
               PARTITION BY a.id ORDER BY {cos_ap} DESC, b.id) AS rl
      FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.id <> b.id
      WHERE a.id % {RECALL_SAMPLE_MOD} = 0),
    apb_pairs AS (
      SELECT DISTINCT a.id, b.id AS nb, {cos_ap} AS cosine
      FROM bkt a JOIN bkt b
        ON a.t = b.t AND a.bucket = b.bucket AND a.id <> b.id
      WHERE a.id % {RECALL_SAMPLE_MOD} = 0),
    apb AS (
      SELECT id, nb,
             row_number() OVER (
               PARTITION BY id ORDER BY cosine DESC, nb) AS rl
      FROM apb_pairs),
    ex AS (
      SELECT a.id, b.id AS nb,
             row_number() OVER (
               PARTITION BY a.id ORDER BY {cos_ap} DESC, b.id) AS re
      FROM base a JOIN base b ON a.id <> b.id
      WHERE a.id % {RECALL_SAMPLE_MOD} = 0),
    j1 AS (
      SELECT ap.rl, ex.re FROM ap
      JOIN ex ON ap.id = ex.id AND ap.nb = ex.nb
      WHERE ap.rl <= {max_k} AND ex.re <= {max_k}),
    j2 AS (
      SELECT apb.rl, ex.re FROM apb
      JOIN ex ON apb.id = ex.id AND apb.nb = ex.nb
      WHERE apb.rl <= {max_k} AND ex.re <= {max_k}),
    h1 AS (SELECT {hit_cols('j1')} FROM j1),
    h2 AS (SELECT {hit_cols('j2')} FROM j2),
    nq AS (SELECT CAST(count(*) AS BIGINT) AS nq FROM embeddings
           WHERE vec_id % {RECALL_SAMPLE_MOD} = 0)
    {stack('blocked', 'h1')}
    UNION ALL
    {stack('bandor', 'h2')}
    """


@query(
    "knn_join_recall",
    oracle=_knn_recall_oracle(),
    doc="Corpus-wide recall of the LSH-blocked KNN self-join against "
        "brute-force exact top-k, at an AUTO-derived plane count "
        "(resolve_n_planes: smallest k with 2^k·target ≥ N, integer "
        "bit-length math mirrored exactly in SQL via length(bin(..))) "
        "— for both the single-table blocking ('blocked') and the "
        "band-OR multi-table blocking ('bandor', 4 independent plane "
        "sets; collision prob 1-(1-p^n)^L vs p^n). Recall is measured "
        "on a deterministic 1-in-5 id sample so the exact side is "
        "O(N²/5) — at scale you sample harder, the blocked sides stay "
        "the production knn_join plans. Integer (method, k, hits, "
        "total) rows; hits@k counts pairs in BOTH the blocked and "
        "exact top-k. The driver corpus is ADVERSARIAL for LSH (near-"
        "orthogonal random vectors: per-plane agreement ≈ 0.5) — the "
        "measured blocked-vs-bandor gap is the point of the query.",
)
def q_knn_join_recall(spark, sf_dir):
    from distributed_computing_projects_spark.operators import (
        autoplanes as AUTOP,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    max_k = max(RECALL_KS)
    approxes = {
        "blocked": AUTOP.knn_join_auto(
            emb, "vec_id", "embedding", max_k,
            target_bucket_size=RECALL_TARGET_BUCKET),
        "bandor": AUTOP.knn_join_tables_auto(
            emb, "vec_id", "embedding", max_k, RECALL_N_TABLES,
            target_bucket_size=RECALL_TARGET_BUCKET),
    }
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v"),
        F.expr(T.sq_norm("embedding", "spark")).alias("nrm"),
    )
    sample = base.filter(F.col("id") % RECALL_SAMPLE_MOD == 0)
    a, b = sample.alias("a"), base.alias("b")
    cos = T.cosine(T.dot("a.v", "b.v", "spark"), "a.nrm", "b.nrm")
    # exact side: the SAMPLE broadcasts (N/5 rows) against the corpus —
    # a BroadcastNestedLoopJoin by construction, never a shuffled
    # cartesian; rank is one window per sampled id
    w = Window.partitionBy("id").orderBy(F.desc("cosine"), F.asc("nb"))
    exact = (
        F.broadcast(a).join(b, F.col("a.id") != F.col("b.id"))
        .select(F.col("a.id").alias("id"), F.col("b.id").alias("nb"),
                F.expr(cos).alias("cosine"))
        .withColumn("re", F.row_number().over(w))
        .filter(F.col("re") <= max_k)
        .select("id", "nb", "re")
    )
    nq = sample.agg(F.count("*").alias("nq"))
    stack = ", ".join(
        f"CAST({k} AS BIGINT), h{k}, CAST({k} AS BIGINT) * nq"
        for k in RECALL_KS
    )
    parts = []
    for method, ap in approxes.items():
        joined = (
            ap.filter(F.col("id") % RECALL_SAMPLE_MOD == 0)
            .select("id", F.col("neighbour_id").alias("nb"),
                    F.col("rank").alias("rl"))
            .join(exact, ["id", "nb"])
        )
        hits = joined.agg(*[
            F.coalesce(
                F.sum(F.when((F.col("rl") <= k) & (F.col("re") <= k), 1)),
                F.lit(0),
            ).cast("bigint").alias(f"h{k}")
            for k in RECALL_KS
        ])
        parts.append(
            hits.crossJoin(F.broadcast(nq)).select(
                F.lit(method).alias("method"),
                F.expr(f"stack({len(RECALL_KS)}, {stack})"
                       " AS (k, hits, total)"),
            )
        )
    return parts[0].unionAll(parts[1])


_QCELLS_SCORE_D = (
    f"({T.sq_norm('cent', 'duck')} - 2 * {T.dot(_QLIT_D, 'cent', 'duck')})"
)


_ASSIGN_SCORE_D = (
    f"({T.sq_norm('c.cent', 'duck')}"
    f" - 2 * {T.dot('e.embedding', 'c.cent', 'duck')})"
)


_TRAINED_CTES = f"""
    {IVT.oracle_ctes()},
    qcells AS (
      SELECT cell FROM cfinal
      ORDER BY {_QCELLS_SCORE_D}, cell LIMIT {ANN_IVF_PROBES}),
    amin AS (
      SELECT e.vec_id AS id, e.embedding AS v, c.cell
      FROM embeddings e CROSS JOIN cfinal c
      QUALIFY row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_ASSIGN_SCORE_D}, c.cell) = 1)
"""


_COS_V_D = T.cosine(
    T.dot("v", _QLIT_D, "duck"),
    T.sq_norm("v", "duck"),
    T.sq_norm(_QLIT_D, "duck"),
)


@query(
    "ann_ivf_trained_topk",
    oracle=f"""
    WITH {_TRAINED_CTES}
    SELECT id, {_COS_V_D} AS cosine
    FROM amin WHERE cell IN (SELECT cell FROM qcells)
    ORDER BY cosine DESC, id LIMIT {ANN_K}
    """,
    doc="IVF-flat ANN with a TRAINED coarse quantizer: 2 Lloyd rounds "
        "on the deterministic 1-in-5 sample (operators/ivf_train.py), "
        "seeded from the fixed centroids, per-cell means computed with "
        "a pinned left-to-right double fold over id-sorted members so "
        "the oracle's list(ORDER BY)+list_reduce reproduces every "
        "centroid bit-for-bit. Corpus assignment is a baked static "
        "argmin expression (narrow codegen — the at-scale path; the "
        "training collect is 16 rows/round, bounded by n_centroids), "
        "probe = 2 nearest trained cells. The oracle replays the "
        "whole run in SQL: same sample, same iteration count, same "
        "(score, cell) tie-break.",
)
def q_ann_ivf_trained_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return IVT.trained_topk(
        spark, emb, ANN_QUERY_VEC, ANN_K, "vec_id", "embedding",
        probes=ANN_IVF_PROBES,
    )


# Recall panel: 10 deterministic query vectors (same derivation family
# as ANN_QUERY_VEC, distinct tags) — a single query's recall@10 is a
# coin flip between quantizers; the 10-query aggregate is stable and
# shows training's payoff (measured at sf0.01: trained 26/100 vs fixed
# 22/100 at probes=2, rising to 45 vs 33 at probes=3).
N_RECALL_QUERIES = 10


RECALL_QUERY_VECS = [
    [((T._h32(f"query{i}-{j}") % 2001) - 1000) / 1000.0
     for j in range(T.EMBEDDING_DIM)]
    for i in range(N_RECALL_QUERIES)
]


def _trained_recall_oracle() -> str:
    parts = [_TRAINED_CTES.rstrip()]
    sel_f, sel_t = [], []
    for i, q in enumerate(RECALL_QUERY_VECS):
        ql = T._float_array_literal(q, "duck")
        cos = T.cosine(T.dot("embedding", ql, "duck"),
                       T.sq_norm("embedding", "duck"),
                       T.sq_norm(ql, "duck"))
        cosv = T.cosine(T.dot("v", ql, "duck"), T.sq_norm("v", "duck"),
                        T.sq_norm(ql, "duck"))
        qsc = f"({T.sq_norm('cent', 'duck')} - 2 * {T.dot(ql, 'cent', 'duck')})"
        cells = ", ".join(str(c) for c in S.ivf_cells(q, ANN_IVF_PROBES))
        parts.append(
            f"ex{i} AS (SELECT vec_id AS id FROM embeddings"
            f" ORDER BY {cos} DESC, vec_id LIMIT {ANN_K})"
        )
        parts.append(
            f"fx{i} AS (SELECT vec_id AS id FROM embeddings"
            f" WHERE {S.ivf_cell_expr('embedding', 'duck')} IN ({cells})"
            f" ORDER BY {cos} DESC, vec_id LIMIT {ANN_K})"
        )
        parts.append(
            f"qc{i} AS (SELECT cell FROM cfinal"
            f" ORDER BY {qsc}, cell LIMIT {ANN_IVF_PROBES})"
        )
        parts.append(
            f"tr{i} AS (SELECT id FROM amin"
            f" WHERE cell IN (SELECT cell FROM qc{i})"
            f" ORDER BY {cosv} DESC, id LIMIT {ANN_K})"
        )
        sel_f.append(f"(SELECT count(*) FROM fx{i} JOIN ex{i} USING (id))")
        sel_t.append(f"(SELECT count(*) FROM tr{i} JOIN ex{i} USING (id))")
    total = N_RECALL_QUERIES * ANN_K
    return (
        "WITH " + ",\n    ".join(parts)
        + f"\n    SELECT 'ivf_fixed' AS method,"
        f" CAST({' + '.join(sel_f)} AS BIGINT) AS hits,"
        f" CAST({total} AS BIGINT) AS total"
        f"\n    UNION ALL SELECT 'ivf_trained' AS method,"
        f" CAST({' + '.join(sel_t)} AS BIGINT) AS hits,"
        f" CAST({total} AS BIGINT) AS total"
    )


def _twolevel_recall_oracle() -> str:
    parts = [
        "aex AS (SELECT vec_id AS id, embedding AS v, "
        f"{IVT.assign_cell_expr('embedding', TL_CENTS, 'duck')} AS cell "
        "FROM embeddings)",
        TL_ASSIGN_CTES.strip(),
    ]
    sel_e, sel_t = [], []
    for i, q in enumerate(RECALL_QUERY_VECS):
        ql = T._float_array_literal(q, "duck")
        cos = T.cosine(T.dot("embedding", ql, "duck"),
                       T.sq_norm("embedding", "duck"),
                       T.sq_norm(ql, "duck"))
        cosv = T.cosine(T.dot("v", ql, "duck"), T.sq_norm("v", "duck"),
                        T.sq_norm(ql, "duck"))
        cells = ", ".join(
            str(c) for c in IVT.probe_cells(q, TL_CENTS, ANN_IVF_PROBES))
        parts.append(
            f"ex{i} AS (SELECT vec_id AS id FROM embeddings"
            f" ORDER BY {cos} DESC, vec_id LIMIT {ANN_K})"
        )
        parts.append(
            f"ae{i} AS (SELECT id FROM aex WHERE cell IN ({cells})"
            f" ORDER BY {cosv} DESC, id LIMIT {ANN_K})"
        )
        parts.append(
            f"at{i} AS (SELECT id FROM a2 WHERE cell IN ({cells})"
            f" ORDER BY {cosv} DESC, id LIMIT {ANN_K})"
        )
        sel_e.append(f"(SELECT count(*) FROM ae{i} JOIN ex{i} USING (id))")
        sel_t.append(f"(SELECT count(*) FROM at{i} JOIN ex{i} USING (id))")
    total = N_RECALL_QUERIES * ANN_K
    return (
        "WITH " + ",\n    ".join(parts)
        + f"\n    SELECT 'tl_exact' AS method,"
        f" CAST({' + '.join(sel_e)} AS BIGINT) AS hits,"
        f" CAST({total} AS BIGINT) AS total"
        f"\n    UNION ALL SELECT 'tl_twolevel' AS method,"
        f" CAST({' + '.join(sel_t)} AS BIGINT) AS hits,"
        f" CAST({total} AS BIGINT) AS total"
    )


@query(
    "ann_ivf_twolevel_recall",
    oracle=_twolevel_recall_oracle(),
    doc=f"Recall@{ANN_K} COST of the two-level coarse assignment: the "
        f"same sized k=64 quantizer assigned exactly (N*k argmin) vs "
        f"through the coarse index (top-{IVT.SUPER_PROBES} super "
        f"probe), probed at the same {ANN_IVF_PROBES}-cell budget over "
        f"{N_RECALL_QUERIES} deterministic query vectors against exact "
        "brute-force top-k. The SCALE table measures the speed win "
        "(114 s -> 70 s at the 100x point); this row measures what it "
        "costs in recall — rows assigned to a near-nearest cell can "
        "fall outside the probed lists. Integer hit counts, drift-free "
        "oracle replaying both assignment paths from baked literals.",
)
def q_ann_ivf_twolevel_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = IVT.assign_cells_join(
        emb.select("vec_id", "embedding"), "vec_id", "embedding", TL_CENTS,
    ).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v"),
        "cell",
    ).persist()
    two = IVT.assign_cells_two_level(
        emb.select("vec_id", "embedding"), "vec_id", "embedding",
        TL_CENTS, carry=("embedding",),
    ).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v"),
        "cell",
    ).persist()

    def topk(df, q, cells):
        ql = T._float_array_literal(q, "spark")
        cos = T.cosine(T.dot("v", ql, "spark"), T.sq_norm("v", "spark"),
                       T.sq_norm(ql, "spark"))
        return (
            df.filter(F.col("cell").isin(cells))
            .select("id", F.expr(cos).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("id"))
            .limit(ANN_K)
        )

    parts = []
    for q in RECALL_QUERY_VECS:
        bf = S.brute_force_topk(
            emb, q, ANN_K, "vec_id", "embedding"
        ).select("id")
        cells = IVT.probe_cells(q, TL_CENTS, ANN_IVF_PROBES)
        for m, df in (("tl_exact", exact), ("tl_twolevel", two)):
            parts.append(
                topk(df, q, cells)
                .join(F.broadcast(bf), "id", "left_semi")
                .agg(F.count("*").alias("hits"))
                .select(F.lit(m).alias("method"), "hits")
            )
    from functools import reduce as _reduce

    total = N_RECALL_QUERIES * ANN_K
    return (
        _reduce(lambda a, b: a.unionAll(b), parts)
        .groupBy("method")
        .agg(F.sum("hits").alias("hits"))
        .select("method", "hits",
                F.lit(total).cast("bigint").alias("total"))
    )


@query(
    "ann_ivf_trained_recall",
    oracle=_trained_recall_oracle(),
    doc=f"Recall@{ANN_K} of the FIXED vs the TRAINED IVF quantizer at "
        f"the same probe budget ({ANN_IVF_PROBES} cells), aggregated "
        f"over {N_RECALL_QUERIES} deterministic query vectors against "
        "each one's exact brute-force top-k — the measured payoff of "
        "training: cells shaped by the data keep more true neighbours "
        "inside the probed lists (trained > fixed on this corpus at "
        "every probe budget tried). The trained corpus assignment is "
        "computed ONCE (query-independent baked argmin, cached) and "
        "every per-query probe reuses it — the shape a recall "
        "evaluation runs at scale. Integer hit counts, drift-free "
        "oracle.",
)
def q_ann_ivf_trained_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = IVT.train(spark, emb, "vec_id", "embedding")
    # query-independent frames, computed once: the trained assignment
    # and the fixed-quantizer cell column (both narrow codegen)
    assigned = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v"),
        F.expr(IVT.assign_cell_expr("embedding", cents, "spark"))
        .alias("cell"),
    ).persist()
    fixed_cells = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v"),
        F.expr(S.ivf_cell_expr("embedding", "spark")).alias("cell"),
    ).persist()

    def topk(df, q, cells):
        ql = T._float_array_literal(q, "spark")
        cos = T.cosine(T.dot("v", ql, "spark"), T.sq_norm("v", "spark"),
                       T.sq_norm(ql, "spark"))
        return (
            df.filter(F.col("cell").isin(cells))
            .select("id", F.expr(cos).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("id"))
            .limit(ANN_K)
        )

    parts = []
    for q in RECALL_QUERY_VECS:
        exact = S.brute_force_topk(
            emb, q, ANN_K, "vec_id", "embedding"
        ).select("id")
        for m, df, cells in (
            ("ivf_fixed", fixed_cells, S.ivf_cells(q, ANN_IVF_PROBES)),
            ("ivf_trained", assigned,
             IVT.probe_cells(q, cents, ANN_IVF_PROBES)),
        ):
            parts.append(
                topk(df, q, cells)
                .join(F.broadcast(exact), "id", "left_semi")
                .agg(F.count("*").alias("hits"))
                .select(F.lit(m).alias("method"), "hits")
            )
    from functools import reduce as _reduce

    total = N_RECALL_QUERIES * ANN_K
    return (
        _reduce(lambda a, b: a.unionAll(b), parts)
        .groupBy("method")
        .agg(F.sum("hits").alias("hits"))
        .select(
            "method",
            F.col("hits").cast("bigint").alias("hits"),
            F.lit(total).cast("bigint").alias("total"),
        )
    )


# --------------------------------------------------------------- PQ


from distributed_computing_projects_spark.operators import pq as PQ  # noqa: E402


def _pq_oracle(where: str = "TRUE") -> str:
    return f"""
    WITH {PQ.oracle_ctes(ANN_QUERY_VEC, where=where)}
    SELECT id, dist AS adc_dist FROM pqadc
    ORDER BY dist, id LIMIT {ANN_K}
    """


@query(
    "ann_pq_topk",
    oracle=_pq_oracle(),
    doc="Product-quantization ANN (Jégou et al. 2011): per-subspace "
        f"codebooks ({PQ.M_SUB} subspaces x {PQ.K_SUB} sub-centroids) "
        "trained with the same sample-bounded pinned-fold Lloyd "
        "machinery as the IVF coarse trainer — all subspaces in one "
        "job per round, a 64-row driver collect — then the whole "
        "corpus ranked by the asymmetric distance: encode to sub-cell "
        "codes and sum the query's baked distance table entries, ONE "
        "narrow codegen expression (no join, no shuffle, no Python). "
        "At 100 TB the codes are a 32x memory compression over raw "
        "float32 vectors — the memory-bound ANN layout. The oracle "
        "replays training, encoding, the distance table, and the "
        "ADC fold in SQL, bit-for-bit (operators/pq.py).",
)
def q_ann_pq_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return PQ.pq_topk(spark, emb, ANN_QUERY_VEC, ANN_K,
                      "vec_id", "embedding")


def _ivfpq_where() -> str:
    cells = S.ivf_cells([float(x) for x in ANN_QUERY_VEC],
                        ANN_IVF_PROBES)
    return (f"{S.ivf_cell_expr('embedding', 'duck')}"
            f" IN ({', '.join(str(c) for c in cells)})")


@query(
    "ann_ivfpq_topk",
    oracle=_pq_oracle(where=_ivfpq_where()),
    doc="IVF-PQ — the standard composed billion-scale ANN layout: the "
        "fixed IVF coarse quantizer prunes the corpus to the query's "
        f"{ANN_IVF_PROBES} nearest cells (the same cell column the "
        "IVF store partitions by, so at scale this is directory "
        "pruning, not a scan), then PQ asymmetric distance ranks only "
        "the survivors. Coarse index bounds the scan, codes bound the "
        "memory. Oracle: the PQ replay with the coarse cell filter "
        "applied to the encode stage.",
)
def q_ann_ivfpq_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return PQ.ivfpq_topk(spark, emb, ANN_QUERY_VEC, ANN_K,
                         "vec_id", "embedding", probes=ANN_IVF_PROBES)


@query(
    "ann_ivfpq_store_topk",
    oracle=_pq_oracle(where=_ivfpq_where()),
    doc="IVF-PQ persisted — the at-scale layout end to end: the corpus "
        "(vec_id % 10 != 0) is encoded to PQ codes and written "
        "hive-partitioned by coarse cell with the codebooks in the "
        "_params sidecar (raw vectors NOT stored — the codes are a "
        "32x compression); an epoch (vec_id % 10 == 0) appends via "
        "the store's OWN sidecar codebooks; the probe prunes to the "
        f"query's {ANN_IVF_PROBES} cells (PartitionFilters) and ranks "
        "the stored CODES against the baked distance table — no "
        "vector is read at query time. Same oracle as ann_ivfpq_topk "
        "(corpus + epoch = all embeddings, and the store probe must "
        "equal the direct computation bit-for-bit).",
)
def q_ann_ivfpq_store_topk(spark, sf_dir):
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    epoch = emb.filter(F.col("vec_id") % 10 == 0)
    path = os.path.join(
        tempfile.gettempdir(),
        f"dcp_ivfpqstore_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    # codebooks train on the FULL corpus view so the oracle's replay
    # (which trains on all embeddings) sees identical centroids
    cents = PQ.train(spark, emb, "vec_id", "embedding")
    PQ.write_ivfpq(spark, corpus, path, "vec_id", "embedding",
                   centroids=cents)
    PQ.append_ivfpq(epoch, path, "vec_id", "embedding")
    return PQ.ivfpq_topk_store(spark, path, ANN_QUERY_VEC, ANN_K,
                               probes=ANN_IVF_PROBES)
