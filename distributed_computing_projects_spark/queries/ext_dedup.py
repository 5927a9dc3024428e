"""Deduplication + decontamination query family: exact/MinHash-LSH/SimHash/n-gram-Jaccard/embedding-cosine near-dup pairs, connected-component clustering, survivors, incremental batch-vs-corpus dedup (on-the-fly and against the persisted band store), and train/eval decontamination. Split from extensions.py (round 7); shared fragments in ext_fragments."""

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
from distributed_computing_projects_spark.operators import ivf_train as IVT
from distributed_computing_projects_spark.operators import similarity as S
from distributed_computing_projects_spark.operators import sketches as SK
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


@query(
    "dedup_exact",
    oracle=f"""
    SELECT {D.NORM_TEXT_DUCK.format(col='text')} AS text_hash,
           min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
    doc="Exact dedup: hash-groupBy on normalized text; survivor = min id.",
)
def q_dedup_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(docs, "doc_id", "text")


@query(
    "minhash_signature",
    oracle=f"""
    WITH hashed AS (SELECT doc_id AS id, {_HASHES_D} AS hs FROM documents),
    sigs AS (SELECT id, [{_SIG_D}] AS sig FROM hashed WHERE len(hs) >= 1)
    SELECT id, concat_ws(',', {', '.join(f'sig[{i + 1}]' for i in range(T.N_PERMS))})
           AS sig_str
    FROM sigs
    """,
    doc=f"{T.N_PERMS}-perm MinHash signatures over 3-word shingles "
        "(signature serialized for the hash compare).",
)
def q_minhash_signature(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs, "doc_id", "text")
    return sigs.select(
        "id",
        F.concat_ws(",", *[F.col("sig")[i].cast("string")
                           for i in range(T.N_PERMS)]).alias("sig_str"),
    )


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_LSH_CTES}
    SELECT id_a, id_b, ({_N_EQ_D}) / {float(T.N_PERMS)} AS est_jaccard
    FROM cand
    WHERE ({_N_EQ_D}) / {float(T.N_PERMS)} >= {MINHASH_THRESHOLD}
    """,
    headline=True,
    doc="MinHash+LSH near-dup candidates: banded bucket equi-join, "
        "estimated Jaccard from signature agreement.",
)
def q_dedup_minhash_lsh(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=MINHASH_THRESHOLD)


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_LSH_CTES},
    sh AS (SELECT doc_id AS id, {_SH_D} AS sh FROM documents),
    scored AS (
      SELECT c.id_a, c.id_b,
             len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS n_inter,
             len(sa.sh) AS la, len(sb.sh) AS lb
      FROM cand c
      JOIN sh sa ON sa.id = c.id_a
      JOIN sh sb ON sb.id = c.id_b)
    SELECT id_a, id_b,
           CAST(n_inter AS DOUBLE) / CAST(la + lb - n_inter AS DOUBLE) AS jaccard
    FROM scored
    WHERE CAST(n_inter AS DOUBLE) / CAST(la + lb - n_inter AS DOUBLE)
          >= {JACCARD_THRESHOLD}
    """,
    doc="EXACT n-gram Jaccard, verified only on LSH candidates (the "
        "scale path: no all-pairs set intersection).",
)
def q_dedup_ngram_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=JACCARD_THRESHOLD)


@query(
    "simhash_fingerprint",
    oracle=f"""
    SELECT doc_id AS id, {T.simhash(_THASHES_D, 'duck')} AS simhash
    FROM documents WHERE len({_TOKS_D}) > 0
    """,
    doc=f"{T.SIMHASH_BITS}-bit weighted SimHash fingerprints (all-integer "
        "math, bit-identical across engines).",
)
def q_simhash_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_fingerprints(docs, "doc_id", "text")


@query(
    "dedup_simhash",
    headline=True,
    oracle=f"""
    WITH fp AS (
      SELECT doc_id AS id, {T.simhash(_THASHES_D, 'duck')} AS simhash
      FROM documents WHERE len({_TOKS_D}) > 0),
    banded AS (
      {' UNION ALL '.join(
          f"SELECT id, simhash, {b} AS band, (simhash >> {8 * b}) & 255 AS byte FROM fp"
          for b in range(4))}),
    pairs AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             {T.hamming('a.simhash', 'b.simhash', 'duck')} AS hamming
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.byte = b.byte AND a.id < b.id)
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= {SIMHASH_MAX_HAMMING}
    """,
    doc="SimHash near-dup pairs within hamming<=3, via the pigeonhole "
        "band join (>=1 of 4 bytes must agree).",
)
def q_dedup_simhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs(docs, "doc_id", "text", max_hamming=SIMHASH_MAX_HAMMING)


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH b AS (
      SELECT vec_id AS id, embedding AS v,
             {T.lsh_bucket('embedding', 'duck')} AS bucket,
             {T.sq_norm('embedding', 'duck')} AS nrm
      FROM embeddings)
    SELECT a.id AS id_a, b.id AS id_b,
           {T.cosine(T.dot('a.v', 'b.v', 'duck'), 'a.nrm', 'b.nrm')} AS cosine
    FROM b a JOIN b b ON a.bucket = b.bucket AND a.id < b.id
    WHERE {T.cosine(T.dot('a.v', 'b.v', 'duck'), 'a.nrm', 'b.nrm')}
          >= {COSINE_THRESHOLD}
    """,
    doc="Embedding-cosine near-dup, blocked by hyperplane LSH bucket "
        "(equi-join on the 8-bit bucket, never all-pairs).",
)
def q_dedup_embedding_cosine(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return D.embedding_neardup_pairs(
        emb, "vec_id", "embedding", threshold=COSINE_THRESHOLD
    )


FINE_N_PLANES = 10


@query(
    "dedup_embedding_cosine_fine",
    oracle=f"""
    WITH b AS (
      SELECT vec_id AS id, embedding AS v,
             {T.lsh_bucket('embedding', 'duck', FINE_N_PLANES)} AS bucket,
             {T.sq_norm('embedding', 'duck')} AS nrm
      FROM embeddings)
    SELECT a.id AS id_a, b.id AS id_b,
           {T.cosine(T.dot('a.v', 'b.v', 'duck'), 'a.nrm', 'b.nrm')} AS cosine
    FROM b a JOIN b b ON a.bucket = b.bucket AND a.id < b.id
    WHERE {T.cosine(T.dot('a.v', 'b.v', 'duck'), 'a.nrm', 'b.nrm')}
          >= {COSINE_THRESHOLD}
    """,
    doc=f"Embedding near-dup at a NON-DEFAULT plane count "
        f"({FINE_N_PLANES} planes -> {2**FINE_N_PLANES} buckets): the "
        "driver-checked proof that the n_planes scale knob produces "
        "identical bucketing cross-engine at any setting, not just "
        "the default.",
)
def q_dedup_embedding_cosine_fine(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return D.embedding_neardup_pairs(
        emb, "vec_id", "embedding", threshold=COSINE_THRESHOLD,
        n_planes=FINE_N_PLANES,
    )


@query(
    "dedup_clusters",
    headline=True,
    oracle=f"""
    WITH RECURSIVE {_LSH_CTES},
    pairs AS (
      SELECT id_a, id_b FROM cand
      WHERE ({_N_EQ_D}) / {float(T.N_PERMS)} >= {MINHASH_THRESHOLD}),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u),
    labels AS (
      SELECT u AS id, least(u, min(v)) AS cluster_id
      FROM reach GROUP BY u),
    sizes AS (
      SELECT cluster_id, count(*) AS cluster_size
      FROM labels GROUP BY cluster_id)
    SELECT l.id, l.cluster_id, l.id = l.cluster_id AS is_keeper,
           s.cluster_size
    FROM labels l JOIN sizes s ON l.cluster_id = s.cluster_id
    """,
    doc="Near-dup clustering: connected components over the LSH pair "
        "graph via alternating large-star/small-star (O(log n) rounds; "
        "SoCC '14), emitting one keeper per cluster. Oracle = recursive "
        "CTE transitive closure over the SAME dual-dialect pair SQL "
        "(closure is fine at oracle scale; the star algorithm is the "
        "100 TB path).",
)
def q_dedup_clusters(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text",
                                threshold=MINHASH_THRESHOLD)
    return D.neardup_clusters(pairs)


EVAL_SOURCE = "src0"


@query(
    "decontaminate_eval",
    oracle=f"""
    WITH {_LSH_CTES},
    hits AS (
      SELECT id_a, id_b, ({_N_EQ_D}) / {float(T.N_PERMS)} AS est_jaccard
      FROM cand
      WHERE ({_N_EQ_D}) / {float(T.N_PERMS)} >= {MINHASH_THRESHOLD}),
    srcs AS (SELECT doc_id, source FROM documents)
    SELECT CASE WHEN sa.source = '{EVAL_SOURCE}' THEN h.id_a ELSE h.id_b END
             AS eval_id,
           CASE WHEN sa.source = '{EVAL_SOURCE}' THEN h.id_b ELSE h.id_a END
             AS train_id,
           h.est_jaccard
    FROM hits h
    JOIN srcs sa ON sa.doc_id = h.id_a
    JOIN srcs sb ON sb.doc_id = h.id_b
    WHERE (sa.source = '{EVAL_SOURCE}') <> (sb.source = '{EVAL_SOURCE}')
    """,
    doc="Train/eval decontamination: training docs that near-duplicate "
        "an eval-set doc (source = src0), as a cross-source filter over "
        "the SAME MinHash-LSH candidate pairs dedup uses — pure "
        "operator composition, no new join shape, so the scale "
        "argument (banded equi-join, never all-pairs) is inherited. "
        "The step every pre-training pipeline runs before a benchmark "
        "is trusted.",
)
def q_decontaminate_eval(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text",
                                threshold=MINHASH_THRESHOLD)
    srcs = docs.select("doc_id", "source")
    sa = srcs.select(F.col("doc_id").alias("id_a"),
                     F.col("source").alias("src_a"))
    sb = srcs.select(F.col("doc_id").alias("id_b"),
                     F.col("source").alias("src_b"))
    is_eval_a = F.col("src_a") == EVAL_SOURCE
    is_eval_b = F.col("src_b") == EVAL_SOURCE
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(is_eval_a != is_eval_b)
        .select(
            F.when(is_eval_a, F.col("id_a")).otherwise(F.col("id_b"))
            .alias("eval_id"),
            F.when(is_eval_a, F.col("id_b")).otherwise(F.col("id_a"))
            .alias("train_id"),
            "est_jaccard",
        )
    )


@query(
    "dedup_survivors",
    oracle=f"""
    WITH RECURSIVE {_LSH_CTES},
    pairs AS (
      SELECT id_a, id_b FROM cand
      WHERE ({_N_EQ_D}) / {float(T.N_PERMS)} >= {MINHASH_THRESHOLD}),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs),
    reach(id, root) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.id
      WHERE r.root < e.v
    ),
    comp AS (SELECT id, min(root) AS cluster_id FROM reach GROUP BY id),
    drops AS (SELECT id FROM comp WHERE id <> cluster_id)
    SELECT d.doc_id, d.lang, d.source FROM documents d
    WHERE d.doc_id NOT IN (SELECT id FROM drops)
    """,
    doc="The deduped corpus itself: documents minus every non-keeper "
        "near-dup cluster member — near-dup pairs -> connected "
        "components -> LEFT ANTI join back to the corpus (the join "
        "every pipeline actually ships; keeper = min id per cluster, "
        "matching neardup_clusters). The anti join's right side is the "
        "drop set (tiny: docs in clusters minus keepers), so at scale "
        "it broadcasts.",
)
def q_dedup_survivors(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text",
                                threshold=MINHASH_THRESHOLD)
    clusters = D.neardup_clusters(pairs)
    drops = clusters.filter(~F.col("is_keeper")).select(
        F.col("id").alias("doc_id")
    )
    return (
        docs.join(F.broadcast(drops), "doc_id", "left_anti")
        .select("doc_id", "lang", "source")
    )


@query(
    "dedup_incremental",
    headline=True,
    oracle=_INCR_ORACLE,
    doc="Incremental dedup: MinHash-banded equi-join of a NEW ingest "
        "batch (one source) against the EXISTING corpus (the rest) — "
        "the day-2 pipeline shape; batch side broadcasts under AQE, "
        "the corpus never self-joins.",
)
def q_dedup_incremental(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.lsh_incremental_pairs_single_scan(
        docs, "doc_id", "text",
        F.col("source") == INCR_BATCH_SOURCE,
        threshold=MINHASH_THRESHOLD,
    )


@query(
    "dedup_incremental_store",
    oracle=_INCR_ORACLE,
    doc="Incremental dedup against a PERSISTED band store: the corpus "
        "band table is materialized once (bandstore.write_bands, hive-"
        "partitioned by a key-hash prefix kb), then the batch probe "
        "prunes to its kb directories (driver-enumerated IN-list -> "
        "PartitionFilters) and equi-joins on (band, key) — probe cost "
        "tracks the batch, not the corpus. Same oracle as "
        "dedup_incremental: the store is a cache of the corpus-side "
        "computation, so the pairs are identical. The store write "
        "inside the query makes the driver row cover the full "
        "write->prune->probe path end-to-end — including the probe "
        "resolving kb_parts from the store's _params sidecar "
        "(operators/storemeta.py) rather than trusting the caller.",
)
def q_dedup_incremental_store(spark, sf_dir):
    import tempfile

    from distributed_computing_projects_spark.operators import (
        bandstore as BSTORE,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") != INCR_BATCH_SOURCE)
    batch = docs.filter(F.col("source") == INCR_BATCH_SOURCE)
    path = os.path.join(
        tempfile.gettempdir(),
        f"dcp_bandstore_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    BSTORE.write_bands(corpus, path, "doc_id", "text")
    return BSTORE.incremental_pairs_against_store(
        spark, path, batch, "doc_id", "text", threshold=MINHASH_THRESHOLD
    )


DECON_NGRAM_N = 7


@query(
    "decontaminate_ngram_hits",
    oracle=f"""
    WITH tg AS (
      SELECT doc_id AS train_id,
             unnest(list_distinct({T.shingles('text', DECON_NGRAM_N, 'duck')}))
               AS gram
      FROM documents WHERE source <> '{EVAL_SOURCE}'),
    eg AS (
      SELECT DISTINCT unnest({T.shingles('text', DECON_NGRAM_N, 'duck')})
               AS gram, 1 AS hit
      FROM documents WHERE source = '{EVAL_SOURCE}')
    SELECT train_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(coalesce(sum(eg.hit), 0) AS BIGINT) AS n_hits
    FROM tg LEFT JOIN eg ON tg.gram = eg.gram
    GROUP BY train_id
    HAVING coalesce(sum(eg.hit), 0) > 0
    """,
    doc="EXACT-substring decontamination (the GPT-3/Lee-et-al 13-gram "
        "discipline, at n=7 for this corpus' shorter docs): train docs "
        "sharing any word n-gram with the eval set (source=src0), with "
        "per-doc distinct-gram totals and hit counts — integers only; "
        "contamination fraction = n_hits/n_grams is the caller's "
        "divide. Complements the MinHash decontaminate_eval (near-dup "
        "semantics) with verbatim-overlap semantics. ONE pass: per-doc "
        "DISTINCT grams (narrow array_distinct) -> explode -> LEFT "
        "join against the BROADCAST global eval gram set (eval sets "
        "are small by nature; at any corpus scale the train side "
        "never shuffles for the join) -> one hash aggregate.",
)
def q_decontaminate_ngram_hits(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sh = T.shingles("text", DECON_NGRAM_N, "spark")
    tg = docs.filter(F.col("source") != EVAL_SOURCE).select(
        F.col("doc_id").alias("train_id"),
        F.explode(F.expr(f"array_distinct({sh})")).alias("gram"),
    )
    eg = (
        docs.filter(F.col("source") == EVAL_SOURCE)
        .select(F.explode(F.expr(sh)).alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        tg.join(F.broadcast(eg), "gram", "left")
        .groupBy("train_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_hits"),
        )
        .filter(F.col("n_hits") > 0)
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup blocked by the TRAINED k-means cells
# ---------------------------------------------------------------------------

SEMANTIC_THRESHOLD = COSINE_THRESHOLD  # same separation argument applies

_SEM_SCORE_D = (
    f"({T.sq_norm('c.cent', 'duck')}"
    f" - 2 * {T.dot('e.embedding', 'c.cent', 'duck')})"
)
_SEM_COS_D = T.cosine(T.dot("a.v", "b.v", "duck"), "a.nrm", "b.nrm")


@query(
    "dedup_lines_c4",
    oracle=f"""
    WITH lx AS (
      SELECT doc_id AS id, string_split(text, chr(10)) AS L
      FROM documents),
    lines AS (
      SELECT id, i AS pos, L[i] AS line
      FROM lx, (SELECT unnest(generate_series(1,
            (SELECT max(len(L)) FROM lx))) AS i)
      WHERE i <= len(L)),
    flagged AS (
      SELECT id, pos, line,
             (length(line) < {D.LINE_DEDUP_MIN_CHARS} OR
              row_number() OVER (PARTITION BY line ORDER BY id, pos) = 1)
               AS keep
      FROM lines)
    SELECT id, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) FILTER (keep) AS BIGINT) AS n_kept,
           coalesce(string_agg(line, chr(10) ORDER BY pos)
                    FILTER (keep), '') AS kept_text
    FROM flagged GROUP BY id
    """,
    doc="C4-style GLOBAL line dedup (Raffel et al. 2020 §2.2: any "
        "repeated span is kept exactly once corpus-wide): explode to "
        "lines, one window over the line key (the only data-sized "
        "shuffle — hash exchange on the line), first (id, pos) "
        "occurrence survives, lines under 20 chars never dedup "
        "(C4's three-sentence-span guard at line granularity). The "
        "result reconstructs each doc's surviving text in order, so "
        "the oracle pins the REBUILT STRING, not just counts.",
)
def q_dedup_lines_c4(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.line_dedup(docs, "doc_id", "text")


@query(
    "dedup_semantic",
    headline=True,
    oracle=f"""
    WITH {IVT.oracle_ctes()},
    amin AS (
      SELECT e.vec_id AS id, e.embedding AS v,
             CAST(c.cell AS BIGINT) AS cell
      FROM embeddings e CROSS JOIN cfinal c
      QUALIFY row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_SEM_SCORE_D}, c.cell) = 1),
    nr AS (
      SELECT id, v, cell, {T.sq_norm('v', 'duck')} AS nrm FROM amin),
    drops AS (
      SELECT DISTINCT b.id
      FROM nr a JOIN nr b ON a.cell = b.cell AND a.id < b.id
      WHERE {_SEM_COS_D} >= {SEMANTIC_THRESHOLD})
    SELECT n.id, n.cell,
           n.id NOT IN (SELECT id FROM drops) AS is_kept
    FROM nr n
    """,
    doc="SemDeDup (Abbas et al. 2023): semantic near-dup removal "
        "blocked by TRAINED k-means cells — the same 2-round Lloyd "
        "quantizer the IVF index trains (one clustering pays for "
        "index and dedup), pairs compared only within a cell, drop "
        "any row with a lower-id near-duplicate there. The oracle "
        "replays training (sample, iterations, tie-breaks all "
        "pinned — ext_ann's differential discipline), re-derives the "
        "full-corpus assignment, and re-runs the blocked pair scan "
        "in SQL.",
)
def q_dedup_semantic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return D.semantic_dedup(
        spark, emb, "vec_id", "embedding", threshold=SEMANTIC_THRESHOLD
    ).orderBy("id")


# ---------------------------------------------------------------------------
# SemDeDup at SIZED k via the two-level coarse assignment index
# ---------------------------------------------------------------------------

# A quantizer sized k=64 stands in for the production k=N/cell_size;
# the coarse index (supers + cell->super mapping) is a deterministic
# driver-side literal both engines replay bit-for-bit. The literals
# and the two-stage assignment CTEs are shared with the ANN family
# (ext_fragments.TL_*).
from distributed_computing_projects_spark.queries.ext_fragments import (  # noqa: E402
    TL_ASSIGN_CTES,
    TL_CENTS as _TL_CENTS,
)


@query(
    "dedup_semantic_twolevel",
    headline=True,
    oracle=f"""
    WITH {TL_ASSIGN_CTES.strip()},
    nr AS (
      SELECT id, v, cell, {T.sq_norm('v', 'duck')} AS nrm FROM a2),
    drops AS (
      SELECT DISTINCT b.id
      FROM nr a JOIN nr b ON a.cell = b.cell AND a.id < b.id
      WHERE {_SEM_COS_D} >= {SEMANTIC_THRESHOLD})
    SELECT n.id, n.cell,
           n.id NOT IN (SELECT id FROM drops) AS is_kept
    FROM nr n
    """,
    doc="SemDeDup with the quantizer SIZED TO THE CORPUS, assigned "
        "through the TWO-LEVEL coarse index "
        "(ivf_train.assign_cells_two_level): stage 1 probes the top-3 "
        "super-cells with one baked expression (zero exchange), stage "
        "2 argmins only the fine cells under the probed supers "
        "(broadcast equi-join + distributive min-struct) — "
        "~N*(1+p)*sqrt(k) scoring folds instead of the exact path's "
        "superlinear N*k. The oracle replays BOTH stages from the "
        "same baked centroid/super literals (unnest = the multi-probe "
        "explode, QUALIFY row_number = the min-struct tie-break), "
        "then re-runs the blocked pair scan.",
)
def q_dedup_semantic_twolevel(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return D.semantic_dedup(
        spark, emb, "vec_id", "embedding", threshold=SEMANTIC_THRESHOLD,
        centroids=_TL_CENTS, assign="twolevel",
    ).orderBy("id")


# ---------------------------------------------------------------------------
# Bloom-filter decontamination: fixed-size membership sketch
# ---------------------------------------------------------------------------

_BLOOM_M = 1 << SK.BLOOM_LOG2_BITS
_SH_DECON_D = T.shingles("text", DECON_NGRAM_N, "duck")


_BLOOM_DECON_ORACLE = f"""
    WITH tg AS (
      SELECT doc_id AS train_id,
             unnest(list_distinct({_SH_DECON_D})) AS gram
      FROM documents WHERE source <> '{EVAL_SOURCE}'),
    eg AS (
      SELECT DISTINCT unnest({_SH_DECON_D}) AS gram
      FROM documents WHERE source = '{EVAL_SOURCE}'),
    ebits AS (
      SELECT pos // 64 AS word,
             bit_or(CAST(1 AS UBIGINT) << CAST(pos % 64 AS INTEGER))
               AS mask
      FROM (
        SELECT {SK._bloom_pos('gram', 'i', 'duck')} AS pos
        FROM eg, (SELECT unnest(generate_series(0, {SK.BLOOM_K - 1}))
                    AS i))
      GROUP BY word),
    probe AS (
      SELECT train_id, gram, p // 64 AS word,
             CAST(p % 64 AS INTEGER) AS b
      FROM (
        SELECT train_id, gram,
               {SK._bloom_pos('gram', 'i', 'duck')} AS p
        FROM tg, (SELECT unnest(generate_series(0, {SK.BLOOM_K - 1}))
                    AS i))),
    setbits AS (
      SELECT p.train_id, p.gram,
             CASE WHEN e.mask IS NULL THEN 0
                  ELSE CAST((e.mask >> p.b) & 1 AS BIGINT) END AS is_set
      FROM probe p LEFT JOIN ebits e ON p.word = e.word),
    per_gram AS (
      SELECT train_id, gram,
             CASE WHEN min(is_set) = 1 THEN 1 ELSE 0 END
               AS passed
      FROM setbits GROUP BY train_id, gram),
    agg AS (
      SELECT train_id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(passed) AS BIGINT) AS n_bloom_hits
      FROM per_gram GROUP BY train_id),
    ex AS (
      SELECT tg.train_id, CAST(count(*) AS BIGINT) AS n_exact_hits
      FROM tg JOIN eg ON tg.gram = eg.gram GROUP BY tg.train_id)
    SELECT a.train_id, a.n_grams, a.n_bloom_hits,
           CAST(coalesce(ex.n_exact_hits, 0) AS BIGINT) AS n_exact_hits
    FROM agg a LEFT JOIN ex ON a.train_id = ex.train_id
    WHERE a.n_bloom_hits > 0
    """


def eval_grams(docs) -> "DataFrame":
    """The eval split's distinct shingle set (the filter's members)."""
    sh = T.shingles("text", DECON_NGRAM_N, "spark")
    return (
        docs.filter(F.col("source") == EVAL_SOURCE)
        .select(F.explode(F.expr(sh)).alias("gram"))
        .distinct()
    )


def bloom_decon_result(docs, bits) -> "DataFrame":
    """Probe the train split against a built (word, mask) filter and
    attach the exact hit counts — the shared back half of the batch
    query and its streaming-store twin (the two differ ONLY in where
    the filter comes from, so both reuse this and both compare against
    the same oracle)."""
    sh = T.shingles("text", DECON_NGRAM_N, "spark")
    tg = docs.filter(F.col("source") != EVAL_SOURCE).select(
        F.col("doc_id").alias("train_id"),
        F.explode(F.expr(f"array_distinct({sh})")).alias("gram"),
    )
    hits = SK.bloom_hits(tg, bits, id_col="train_id").withColumnRenamed(
        "id", "train_id"
    )
    exact = (
        tg.join(F.broadcast(eval_grams(docs).withColumn("hit", F.lit(1))),
                "gram")
        .groupBy("train_id")
        .agg(F.count("*").cast("bigint").alias("n_exact_hits"))
    )
    return (
        hits.filter(F.col("n_bloom_hits") > 0)
        .join(exact, "train_id", "left")
        .select(
            "train_id", "n_grams", "n_bloom_hits",
            F.coalesce(F.col("n_exact_hits"), F.lit(0)).cast("bigint")
            .alias("n_exact_hits"),
        )
    )


@query(
    "decontaminate_bloom",
    oracle=_BLOOM_DECON_ORACLE,
    doc="Decontamination through a BLOOM FILTER instead of the exact "
        "broadcast gram set: the eval set packs into a FIXED 8 KiB "
        "bit array (m=2^16, k=3) regardless of how large it grows — "
        "the scale story the exact set lacks — built by one bit_or "
        "aggregate (partial aggregation IS the filter merge, like the "
        "CMS counter sum) and probed with a broadcast join. Hits are "
        "a deterministic SUPERSET of exact membership (classic "
        "one-sided FPR); the output carries both counts so the "
        "false-positive overhead is visible, and every column is an "
        "exact integer — both engines compute identical md5-derived "
        "bit positions and identical BIGINT masks. Completes the "
        "sketch tier: KMV = cardinality, CMS = frequency, Bloom = "
        "membership.",
)
def q_decontaminate_bloom(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return bloom_decon_result(docs, SK.bloom_bits(eval_grams(docs)))


# ---------------------------------------------------------------------------
# Edit-distance verification: the exact-integer fuzzy-dedup tier
# ---------------------------------------------------------------------------

MAX_EDIT_DISTANCE = 6


@query(
    "dedup_edit_distance",
    oracle=f"""
    WITH {_LSH_CTES},
    verified AS (
      SELECT c.id_a, c.id_b,
             CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist
      FROM cand c
      JOIN documents da ON c.id_a = da.doc_id
      JOIN documents db ON c.id_b = db.doc_id)
    SELECT id_a, id_b, dist FROM verified
    WHERE dist <= {MAX_EDIT_DISTANCE}
    """,
    doc="Fuzzy dedup verified by EDIT DISTANCE: MinHash-LSH generates "
        "the candidates (banded equi-join, never all-pairs — "
        "Levenshtein is O(len^2) per pair, so running it on anything "
        "but a blocked candidate set is a scale error), then each "
        "candidate pair's full texts join back and classic DP "
        f"Levenshtein keeps pairs within {MAX_EDIT_DISTANCE} edits. Both "
        "engines ship the textbook integer algorithm, so the DISTANCE "
        "VALUE hash-matches — the exactness MinHash's estimate and "
        "cosine's float threshold can't offer. The text-fetch joins "
        "carry NO broadcast hints: candidates are ~linear in N (the "
        "auto-sizer pins per-row bucket work) and texts are the "
        "corpus, so neither side is broadcast-safe by construction — "
        "AQE picks broadcast at runtime when a side measures small "
        "(it does at test SF) and falls back to shuffle joins on "
        "doc_id at corpus scale, the 100TB-legal plan.",
)
def q_dedup_edit_distance(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cand = D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.0)
    texts = docs.select("doc_id", "text")
    return (
        cand.select("id_a", "id_b")
        .join(
            texts.select(
                F.col("doc_id").alias("id_a"),
                F.col("text").alias("text_a")),
            "id_a",
        )
        .join(
            texts.select(
                F.col("doc_id").alias("id_b"),
                F.col("text").alias("text_b")),
            "id_b",
        )
        .select(
            "id_a", "id_b",
            F.levenshtein("text_a", "text_b").cast("bigint").alias("dist"),
        )
        .filter(F.col("dist") <= MAX_EDIT_DISTANCE)
    )
