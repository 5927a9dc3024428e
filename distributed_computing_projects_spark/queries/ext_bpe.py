"""BPE tokenizer queries: distributed merge training and corpus
encoding (operators/bpe.py), each under an exact SQL oracle that
REPLAYS the training rounds in DuckDB over a delimiter-wrapped string
encoding of the symbol table.

Oracle construction (generated programmatically below, one CTE block
per merge round): the word table becomes ``' c h a r s '`` strings;
round k picks argmax(weighted adjacent-pair count) with the same
deterministic total order as the trainer (count desc, left, right),
then applies the merge as ``replace(s, ' l r ', ' lr ')`` iterated
``_REPLACE_PASSES`` times — a single left-to-right replace pass
misses occurrences whose leading separator was consumed by the
previous match (the ``a b a b`` alternation), and each pass at least
halves the misses, so 5 passes reach the fixpoint for words capped
at 20 chars. The fixpoint equals the trainer's leftmost-greedy fold
(a fused token never re-forms its own left side, so greedy IS the
fixpoint), which the Spark/pure-python cross-check in
tests/test_bpe.py pins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_computing_projects_spark.operators import bpe as B
from distributed_computing_projects_spark.queries import query
from distributed_computing_projects_spark.sources.registry import load_table

N_MERGES = 6
_REPLACE_PASSES = 5


def _apply_merge_sql(s: str, l: str, r: str) -> str:
    """Nested-replace fixpoint application of one merge to ``s``;
    ``l``/``r`` are SQL expressions (column refs), not literals."""
    pat = f"' ' || {l} || ' ' || {r} || ' '"
    rep = f"' ' || {l} || {r} || ' '"
    for _ in range(_REPLACE_PASSES):
        s = f"replace({s}, {pat}, {rep})"
    return s


def _train_ctes(n_merges: int) -> str:
    """CTE chain w0, s0, p1, m1, s1, ..., pN, mN replaying training."""
    parts = [f"""
    w0 AS (
      SELECT w, count(*) AS cnt FROM (
        SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents) t
      WHERE w <> '' AND length(w) <= {B.MAX_WORD_LEN}
      GROUP BY w),
    s0 AS (
      SELECT w,
             ' ' || array_to_string(string_split(w, ''), ' ') || ' '
               AS s,
             cnt
      FROM w0)"""]
    for k in range(1, n_merges + 1):
        prev = f"s{k - 1}"
        parts.append(f"""
    p{k} AS (
      SELECT sy[i] AS l, sy[i + 1] AS r, sum(cnt) AS c
      FROM (SELECT string_split(trim(s), ' ') AS sy, cnt FROM {prev}),
           (SELECT unnest(generate_series(1, {B.MAX_WORD_LEN})) AS i)
      WHERE i < len(sy)
      GROUP BY 1, 2),
    m{k} AS (
      SELECT {k - 1} AS rank, l, r, c FROM p{k}
      ORDER BY c DESC, l, r LIMIT 1),
    s{k} AS (
      SELECT p.w,
             CASE WHEN m.l IS NULL THEN p.s
                  ELSE {_apply_merge_sql('p.s', 'm.l', 'm.r')} END AS s,
             p.cnt
      FROM {prev} p LEFT JOIN m{k} m ON TRUE)""")
    return ",".join(parts)


@query(
    "bpe_train_merges",
    oracle=f"""
    WITH {_train_ctes(N_MERGES)}
    SELECT CAST(rank AS INTEGER) AS rank,
           l AS "left", r AS "right",
           CAST(c AS BIGINT) AS pair_count
    FROM ({" UNION ALL ".join(f"SELECT * FROM m{k}"
                              for k in range(1, N_MERGES + 1))}) u
    """,
    doc=f"Distributed BPE tokenizer TRAINING (Sennrich et al. 2016): "
        f"{N_MERGES} merge rounds over the word-frequency table — one "
        "corpus scan, then vocab-sized pair aggregations with a "
        "deterministic argmax (count desc, left, right) and JVM-side "
        "leftmost-greedy fold application; the oracle replays every "
        "round in SQL over delimiter-wrapped symbol strings "
        "(module doc). The returned merge TRACE (rank, pair, count) "
        "is the artifact a tokenizer ships, and training it twice is "
        "bit-identical — the reproducibility a data pipeline needs.",
)
def q_bpe_train_merges(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return B.train_bpe(spark, docs, "text", N_MERGES)


@query(
    "bpe_encode_tokens",
    oracle=f"""
    WITH {_train_ctes(N_MERGES)},
    toklen AS (
      SELECT w, len(string_split(trim(s), ' ')) AS t FROM s{N_MERGES}),
    docwords AS (
      SELECT id, w FROM (
        SELECT doc_id AS id,
               unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents) t
      WHERE w <> '')
    SELECT d.id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(coalesce(tl.t, length(d.w))) AS BIGINT) AS n_tokens
    FROM docwords d LEFT JOIN toklen tl ON d.w = tl.w
    GROUP BY d.id
    """,
    doc="BPE ENCODE over the corpus with the merges just trained: "
        "per-document word and token counts under the learned "
        f"{N_MERGES}-merge vocabulary, applied by the same JVM fold "
        "as training (no Python); words past the trainer's "
        f"{B.MAX_WORD_LEN}-char cap fall back to one token per char "
        "(out-of-alphabet). The oracle replays training, derives "
        "tokens-per-word from the final symbol table, and joins it "
        "back to per-doc word occurrences.",
)
def q_bpe_encode_tokens(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (row["left"], row["right"])
        for row in B.train_bpe(spark, docs, "text", N_MERGES)
        .orderBy("rank").collect()
    ]
    return B.encode_tokens(docs, "doc_id", "text", merges)
