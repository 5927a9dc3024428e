"""Condorcet voting — reference application #3 (two MapReduce rounds).

Reference round 1: for each ballot (a comma-separated permutation,
most-preferred first) emit, for every unordered candidate pair, the
pair key ``"(a b)"`` with a/b ordered lexicographically and value "1"
if the lexicographically-smaller candidate was preferred, else "0"
(mp3/src/maple/condorcet_1.go:8-24); juice declares the pair winner,
ties going to the smaller candidate (``count1 >= count0``,
mp3/src/juice/condorcet_1.go:3-20).

Reference round 2: tally pairwise wins per candidate; a candidate with
``numCandidates-1`` wins is the Condorcet winner, else emit the argmax
set — including zero-win candidates when maxCount==0 — with the exact
strings of mp3/src/juice/condorcet_2.go:9-47 (note the trailing comma
in the tie set).

Spark shape: the reference shuffles one line per (ballot, pair) —
45 rows per ballot for m=10 — then shuffles again globally. Here the
pair expansion happens inside one narrow stage with higher-order array
functions (no self-join, no Python), partial aggregation combines
map-side, and only (m·(m-1)/2) pair rows ever cross the shuffle.
Round 2 operates on ≤ m(m-1)/2 rows — broadcast territory.

Divergence documented per SURVEY §7.3.2: the reference's pair-string
surgery (``key[0]+key[3]+key[2]+key[1]+key[4]``) only works for
single-digit candidates; we compare candidates numerically, which is
identical for m ≤ 10 and well-defined beyond.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# For each position i, pair ballot[i] with every later candidate:
# (least, greatest, vote) where vote=1 iff the smaller candidate is the
# earlier (preferred) one — exactly the reference maple's emit rule.
_PAIRS_EXPR = """
flatten(
  transform({b}, (x, i) ->
    transform(slice({b}, i + 2, size({b})), y ->
      struct(least(x, y) AS a, greatest(x, y) AS b,
             CASE WHEN x < y THEN 1 ELSE 0 END AS vote))))
"""

# Rank-aware variant over array<struct<r, s>> sorted by (r, s): a RANK
# TIE awards the pair to NEITHER side (the reference's strict-list
# ballots cannot tie, but rank-derived ballots — min line number per
# supplier — tie constantly, and collapsing a tie into list order
# would hand the pair to the smaller id: a real bug this expression
# replaces, caught by the sf0.001 driver gate). Since the array is
# sorted, y never outranks x: x.r < y.r means x preferred, x.r = y.r
# means no vote.
_RANKED_PAIRS_EXPR = """
flatten(
  transform({b}, (x, i) ->
    transform(slice({b}, i + 2, size({b})), y ->
      struct(least(x.s, y.s) AS a, greatest(x.s, y.s) AS b,
             CASE WHEN x.r < y.r AND x.s < y.s THEN 1 ELSE 0 END
               AS a_vote,
             CASE WHEN x.r < y.r AND x.s > y.s THEN 1 ELSE 0 END
               AS b_vote))))
"""


def pairwise_preferences(df: DataFrame, ballot_col: str = "ballot",
                         ranked: bool = False) -> DataFrame:
    """Round 1. DataFrame[a int, b int, a_pref bigint, b_pref bigint,
    winner int] with a < b; PAIR ties (a_pref == b_pref) award the
    pair to ``a``.

    ``ranked=False``: ``ballot_col`` is a strict preference list (the
    reference's permutation ballots) — every pair votes one way.
    ``ranked=True``: ``ballot_col`` is array<struct<r, s>> sorted by
    (r, s); a RANK tie (equal r) votes for neither side, matching the
    raw-rank comparison semantics of the round1 SQL oracle.

    Output is UNORDERED: callers that present the pair table sort it
    themselves (``.orderBy("a", "b")``). Sorting here would range-
    shuffle the pair frame inside a building block that
    :func:`condorcet_wins` immediately re-aggregates — the same wasted
    exchange that made ``juice()``'s output sort opt-out.
    """
    if ranked:
        pairs = df.select(
            F.explode(F.expr(_RANKED_PAIRS_EXPR.format(b=ballot_col)))
            .alias("p")
        ).select("p.a", "p.b", "p.a_vote", "p.b_vote")
        agg = [F.sum("a_vote").alias("a_pref"),
               F.sum("b_vote").alias("b_pref")]
    else:
        pairs = df.select(
            F.explode(F.expr(_PAIRS_EXPR.format(b=ballot_col))).alias("p")
        ).select("p.a", "p.b", "p.vote")
        agg = [F.sum("vote").alias("a_pref"),
               F.sum(F.lit(1) - F.col("vote")).alias("b_pref")]
    return (
        pairs.groupBy("a", "b")
        .agg(*agg)
        .withColumn(
            "winner",
            F.when(F.col("a_pref") >= F.col("b_pref"), F.col("a")).otherwise(F.col("b")),
        )
    )


def _candidate_df(df: DataFrame, ballot_col: str,
                  num_candidates: int | None,
                  candidates: DataFrame | None,
                  ranked: bool = False) -> DataFrame:
    """Candidate universe as DataFrame[candidate] — explicit frame, or
    ``range(num_candidates)`` (the reference's fixed-size votes array,
    mp3/src/juice/condorcet_2.go:11), or — fully lazily — the distinct
    candidates appearing in any ballot. The lazy form equals the
    reference whenever every candidate is ranked at least once (always
    true for permutation ballots); it avoids the driver-side ``first()``
    the eager inference needed."""
    if candidates is not None:
        return candidates.toDF("candidate")
    if num_candidates is not None:
        spark = df.sparkSession
        return spark.range(num_candidates).select(
            F.col("id").cast("int").alias("candidate"))
    exploded = df.select(F.explode(F.col(ballot_col)).alias("_e"))
    cand = F.col("_e.s") if ranked else F.col("_e")
    return exploded.select(cand.alias("candidate")).distinct()


def condorcet_wins(df: DataFrame, ballot_col: str = "ballot",
                   num_candidates: int | None = None,
                   candidates: DataFrame | None = None,
                   ranked: bool = False) -> DataFrame:
    """Round 2 tally. DataFrame[candidate, wins bigint] for every
    candidate in the universe (zero-win candidates included, as the
    reference's fixed-size votes array does)."""
    cand = _candidate_df(df, ballot_col, num_candidates, candidates, ranked)
    tallies = (
        pairwise_preferences(df, ballot_col, ranked=ranked)
        .groupBy("winner")
        .agg(F.count("*").alias("wins"))
    )
    return (
        cand.join(F.broadcast(tallies), cand.candidate == tallies.winner, "left")
        .select("candidate", F.coalesce("wins", F.lit(0)).alias("wins"))
        .orderBy("candidate")
    )


def condorcet(df: DataFrame, ballot_col: str = "ballot",
              num_candidates: int | None = None,
              candidates: DataFrame | None = None,
              ranked: bool = False) -> DataFrame:
    """Full two-round query with the reference's exact output strings:
    DataFrame[key string, value string] — either
    ``("<i>", " is the condorcet winner!")`` or
    ``("<i>,<j>,", " have the highest condorcet counts, no winner.")``.

    Fully lazy — zero driver-side actions at build time (the round-1
    rewrite removed a ``first()`` + ``count()`` pair that re-ran the
    whole pipeline when no winner existed). The champion-vs-tie branch
    (mp3/src/juice/condorcet_2.go:23-45) is expressed IN the plan: both
    candidate rows are built from the same persisted ``wins`` (≤ m
    rows, one pipeline materialization), unioned with a priority flag,
    and a whole-frame ``min`` keeps the champion row iff one exists.
    """
    # The persist is what makes one pipeline run serve both branches.
    # Its lifetime is intentionally the session's: the frame is <= m
    # rows (m = candidate count, bytes not gigabytes), there is no
    # post-return hook to unpersist from, and unpersisting before the
    # caller's action would re-run the pipeline twice — the round-1
    # weakness this rewrite removed. spark.catalog.clearCache() is the
    # caller-side reset if m is ever pathological.
    wins = condorcet_wins(df, ballot_col, num_candidates, candidates,
                          ranked).persist()
    # All scalars stay lazy 1-row frames broadcast into the plan:
    # m (candidate count) for the champion test, mx for the argmax set.
    stats = wins.agg(F.count("*").alias("_m"), F.max("wins").alias("_mx"))
    annotated = wins.crossJoin(F.broadcast(stats))
    champ_row = (
        annotated.filter(F.col("wins") == F.col("_m") - 1)
        .orderBy("candidate")
        .limit(1)
        .select(
            F.col("candidate").cast("string").alias("key"),
            F.lit(" is the condorcet winner!").alias("value"),
        )
    )
    tie_set = (
        annotated.filter(F.col("wins") == F.col("_mx"))
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list("candidate")),
                                 lambda c: F.concat(c.cast("string"), F.lit(",")))
            ).alias("key")
        )
        .select("key", F.lit(" have the highest condorcet counts, no winner.").alias("value"))
    )
    both = champ_row.withColumn("_pri", F.lit(0)).unionByName(
        tie_set.withColumn("_pri", F.lit(1))
    )
    whole = Window.partitionBy(F.lit(1))
    return (
        both.withColumn("_best", F.min("_pri").over(whole))
        .filter(F.col("_pri") == F.col("_best"))
        .select("key", "value")
    )
