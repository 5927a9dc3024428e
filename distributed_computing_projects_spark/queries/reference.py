"""Reference-parity queries (SURVEY §2 / §3): grep, wordcount, the wine
filter-aggregate shape, condorcet, tail-n, and the MapleJuice API
driven end-to-end — each expressed over the driver's tables so the
DuckDB oracle can check them.

The condorcet queries derive real ballots from ``lineitem``: within an
order, suppliers are ranked by the line number of their first item —
every order is a ballot over suppliers. Same two-round semantics as
mp3/src/{maple,juice}/condorcet_*.go, on relational data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_computing_projects_spark.operators.grep import grep, tail_n
from distributed_computing_projects_spark.operators.maplejuice import juice, maple
from distributed_computing_projects_spark.operators.wine import token_occurrence_agg
from distributed_computing_projects_spark.operators.wordcount import wordcount
from distributed_computing_projects_spark.queries import query
from distributed_computing_projects_spark.sources.registry import load_table

GREP_PATTERN = "key.*join"


@query(
    "grep",
    oracle=f"""
    SELECT doc_id, text
    FROM documents
    WHERE regexp_matches(text, '{GREP_PATTERN}')
    """,
    headline=True,
    doc="Distributed grep with provenance (mp3/src/logs.go:88-157).",
)
def q_grep(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return grep(docs, GREP_PATTERN, text_col="text", provenance_cols=["doc_id"])


@query(
    "grep_count",
    oracle=f"""
    SELECT count(*) AS n_matches
    FROM documents
    WHERE regexp_matches(text, '{GREP_PATTERN}')
    """,
    doc="Grep hit tally (mp0/src/service/client.go:70-76).",
)
def q_grep_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").rlike(GREP_PATTERN))
        .agg(F.count("*").alias("n_matches"))
    )


@query(
    "wordcount",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
    headline=True,
    doc="Wordcount app (mp3/src/maple/wordcount.go, juice/wordcount.go).",
)
def q_wordcount(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return wordcount(docs, "text")


@query(
    "wine_filter_agg",
    oracle="""
    SELECT source, count(*) AS occurrences
    FROM (
      SELECT source, unnest(string_split_regex(text, '\\s+')) AS tok
      FROM documents WHERE lang = 'en'
    )
    WHERE tok = 'spark'
    GROUP BY source
    """,
    headline=True,
    doc="Wine filter-agg shape: dimension filter + PER-OCCURRENCE token "
        "count grouped (mp3/src/mj_wine/wine_maple.go:9-20).",
)
def q_wine_filter_agg(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return token_occurrence_agg(
        docs, F.col("lang") == "en", "text", "spark", "source"
    )


# --- Condorcet over lineitem-derived ballots ---------------------------------

_BALLOT_RANKS_SQL = """
  SELECT l_orderkey, l_suppkey, min(l_linenumber) AS rank
  FROM lineitem GROUP BY l_orderkey, l_suppkey
"""


@query(
    "condorcet_round1",
    oracle=f"""
    WITH ranks AS ({_BALLOT_RANKS_SQL})
    SELECT r1.l_suppkey AS a, r2.l_suppkey AS b,
           CAST(sum(CASE WHEN r1.rank < r2.rank THEN 1 ELSE 0 END) AS BIGINT) AS a_pref,
           CAST(sum(CASE WHEN r1.rank > r2.rank THEN 1 ELSE 0 END) AS BIGINT) AS b_pref,
           CASE WHEN sum(CASE WHEN r1.rank < r2.rank THEN 1 ELSE 0 END)
                     >= sum(CASE WHEN r1.rank > r2.rank THEN 1 ELSE 0 END)
                THEN r1.l_suppkey ELSE r2.l_suppkey END AS winner
    FROM ranks r1 JOIN ranks r2
      ON r1.l_orderkey = r2.l_orderkey AND r1.l_suppkey < r2.l_suppkey
    GROUP BY r1.l_suppkey, r2.l_suppkey
    """,
    headline=True,
    doc="Condorcet round 1: pairwise winners, ties to the smaller "
        "candidate (mp3/src/juice/condorcet_1.go:3-20).",
)
def q_condorcet_round1(spark, sf_dir):
    # One shuffle on l_orderkey, then INTRA-ROW pair expansion (same
    # shape as the ballot operator / reference maple, condorcet_1.go) —
    # the equivalent ranks-self-join costs an extra shuffle plus the
    # join itself. Orders hold <= 7 items, so the per-row O(k^2)
    # dedupe/expansion is constant-bounded.
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.collect_list(
            F.struct(F.col("l_suppkey").alias("s"),
                     F.col("l_linenumber").alias("r"))).alias("cs"))
    )
    # min rank per distinct supplier within the order
    ranks = (
        "transform(array_sort(array_distinct(transform(cs, c -> c.s))),"
        " s -> struct(s AS s,"
        " array_min(transform(filter(cs, c -> c.s = s), c -> c.r)) AS r))"
    )
    # all supplier pairs with a < b; ties in rank count toward neither.
    # R binds the ranks array ONCE per row (naive inlining re-evaluated
    # it 3x per row — measured 2.5x slower end-to-end).
    pairs = f"""
    transform(array({ranks}), R ->
      flatten(transform(R, (x, i) ->
        transform(slice(R, i + 2, size(R)), y ->
          struct(x.s AS a, y.s AS b,
                 CASE WHEN x.r < y.r THEN 1 ELSE 0 END AS a_beats,
                 CASE WHEN x.r > y.r THEN 1 ELSE 0 END AS b_beats)))))[0]
    """
    return (
        per_order.select(F.explode(F.expr(pairs)).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(
            F.sum("p.a_beats").alias("a_pref"),
            F.sum("p.b_beats").alias("b_pref"),
        )
        .withColumn(
            "winner",
            F.when(F.col("a_pref") >= F.col("b_pref"), F.col("a")).otherwise(F.col("b")),
        )
    )


@query(
    "condorcet_wins",
    oracle=f"""
    WITH ranks AS ({_BALLOT_RANKS_SQL}),
    round1 AS (
      SELECT CASE WHEN sum(CASE WHEN r1.rank < r2.rank THEN 1 ELSE 0 END)
                       >= sum(CASE WHEN r1.rank > r2.rank THEN 1 ELSE 0 END)
                  THEN r1.l_suppkey ELSE r2.l_suppkey END AS winner
      FROM ranks r1 JOIN ranks r2
        ON r1.l_orderkey = r2.l_orderkey AND r1.l_suppkey < r2.l_suppkey
      GROUP BY r1.l_suppkey, r2.l_suppkey
    )
    SELECT s.s_suppkey AS candidate,
           count(round1.winner) AS wins
    FROM supplier s LEFT JOIN round1 ON round1.winner = s.s_suppkey
    GROUP BY s.s_suppkey
    """,
    doc="Condorcet round 2 tally incl. zero-win candidates "
        "(mp3/src/juice/condorcet_2.go:9-47).",
)
def q_condorcet_wins(spark, sf_dir):
    round1 = q_condorcet_round1(spark, sf_dir)
    suppliers = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("candidate")
    )
    tallies = round1.groupBy("winner").agg(F.count("*").alias("wins"))
    return (
        suppliers.join(
            F.broadcast(tallies), suppliers.candidate == tallies.winner, "left"
        )
        .groupBy("candidate")
        .agg(F.sum(F.coalesce("wins", F.lit(0))).alias("wins"))
    )


@query(
    "tail_n",
    oracle="""
    SELECT doc_id, text FROM (
      SELECT doc_id, text FROM documents ORDER BY doc_id DESC LIMIT 10
    ) ORDER BY doc_id
    """,
    doc="Tail-N of a dataset (`print logs -n`, mp3/src/logs.go:59-85).",
)
def q_tail_n(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return tail_n(docs, 10, "doc_id")


@query(
    "maplejuice_wordcount",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
    doc="Wordcount through the MapleJuice UDF API (native tier) — proves "
        "the maple/juice contract end-to-end (SURVEY §2.10).",
)
def q_maplejuice_wordcount(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("text")

    def wc_maple(line):
        # ASCII \s+ split: Python str.split() breaks on Unicode
        # whitespace (e.g. \xa0) where the oracle's RE2 and the
        # DataFrame twin's Java regex do not — the token streams must
        # match for the value-hash compare.
        import re

        for w in re.split(r"\s+", line, flags=re.ASCII):
            if w:
                yield w, "1"

    def wc_juice(key, values):
        total = 0
        for v in values:
            try:
                total += int(v)
            except ValueError:  # reference skips non-ints (wordcount.go:10-13)
                continue
        return str(total)

    kv = maple(docs, wc_maple)
    out = juice(kv, wc_juice)
    return out.select(
        F.col("key").alias("word"), F.col("value").cast("bigint").alias("n")
    )
