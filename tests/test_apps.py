"""Wordcount / wine / condorcet application parity tests.

Oracles are computed in plain Python over collected rows (closed-form
where possible), mirroring the reference's differential-test strategy
(SURVEY §5: MapleJuice vs Hadoop twins)."""

from collections import Counter

import numpy as np
from pyspark.sql import functions as F

from distributed_computing_projects_spark.operators import (
    condorcet,
    pairwise_preferences,
    token_occurrence_agg,
    wordcount,
)
from distributed_computing_projects_spark.operators.condorcet import condorcet_wins
from distributed_computing_projects_spark.sources import load_table


def test_wordcount_closed_form(spark):
    # Mirrors mp3/src/trees/gen_file.py: one fixed sentence repeated N
    # times => exactly predictable counts (golden: output/part-00000).
    sentence = "This is a test file to test word count and see how many words it can count"
    n = 1000
    df = spark.createDataFrame([(sentence,)] * n, "line string")
    got = {r["word"]: r["n"] for r in wordcount(df).collect()}
    assert got["test"] == 2 * n
    assert got["count"] == 2 * n
    assert got["and"] == n
    assert sum(got.values()) == 17 * n


def test_wordcount_whitespace_runs(spark):
    df = spark.createDataFrame([("  a  b\ta ",)], "line string")
    got = {r["word"]: r["n"] for r in wordcount(df).collect()}
    assert got == {"a": 2, "b": 1}


def test_wordcount_vs_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = {r["word"]: r["n"] for r in wordcount(docs, "text").collect()}
    want = Counter()
    for r in docs.select("text").collect():
        want.update(r["text"].split())
    assert got == dict(want)


def test_wine_per_occurrence_semantics(spark):
    # The trap row: token repeats => counts 2, not 1
    # (mp3/src/mj_wine/wine_maple.go:16-20; SURVEY §7.3.1).
    rows = [
        ("Chardonnay", "succulent and succulent again", "CA"),
        ("Chardonnay", "merely succulent", "CA"),
        ("Chardonnay", "no match here", "OR"),
        ("Merlot", "succulent but wrong variety", "CA"),
        ("Chardonnay", "succulent", "OR"),
    ]
    df = spark.createDataFrame(rows, "variety string, description string, region_2 string")
    got = {
        r["region_2"]: r["occurrences"]
        for r in token_occurrence_agg(
            df, F.col("variety") == "Chardonnay", "description", "succulent", "region_2"
        ).collect()
    }
    assert got == {"CA": 3, "OR": 1}


def _ballots(num_ballots: int, m: int, seed: int, bias_candidate: int | None = None):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(num_ballots):
        b = list(rng.permutation(m))
        if bias_candidate is not None and rng.random() < 0.8:
            b.remove(bias_candidate)
            b.insert(0, bias_candidate)
        out.append((i, [int(x) for x in b]))
    return out


def _numpy_pairwise(ballots, m):
    """Independent oracle: direct pairwise tally from ballot positions."""
    pref = np.zeros((m, m), dtype=int)
    for _, b in ballots:
        pos = {c: i for i, c in enumerate(b)}
        for a in range(m):
            for c in range(a + 1, m):
                if pos[a] < pos[c]:
                    pref[a][c] += 1
                else:
                    pref[c][a] += 1
    return pref


def test_pairwise_preferences_vs_numpy(spark):
    m = 5
    ballots = _ballots(300, m, seed=7)
    df = spark.createDataFrame(ballots, "ballot_id long, ballot array<int>")
    pref = _numpy_pairwise(ballots, m)
    for r in pairwise_preferences(df).collect():
        a, b = r["a"], r["b"]
        assert r["a_pref"] == pref[a][b]
        assert r["b_pref"] == pref[b][a]
        assert r["winner"] == (a if pref[a][b] >= pref[b][a] else b)


def test_condorcet_with_winner(spark):
    m = 6
    ballots = _ballots(400, m, seed=11, bias_candidate=3)
    df = spark.createDataFrame(ballots, "ballot_id long, ballot array<int>")
    pref = _numpy_pairwise(ballots, m)
    wins = [(sum(1 for b in range(m) if a != b and
                 (pref[a][b] if a < b else pref[a][b]) >
                 (pref[b][a] if a < b else pref[b][a]) or
                 (a < b and pref[a][b] == pref[b][a])))
            for a in range(m)]
    rows = condorcet(df).collect()
    assert len(rows) == 1
    # candidate 3 is boosted to first place 80% of the time: beats all.
    assert rows[0]["key"] == "3"
    assert rows[0]["value"] == " is the condorcet winner!"


def test_condorcet_no_winner_tie_format(spark):
    # A perfect 3-cycle: a>b>c, b>c>a, c>a>b — no Condorcet winner,
    # every candidate wins exactly one pair => tie set "0,1,2,".
    rows = [(0, [0, 1, 2]), (1, [1, 2, 0]), (2, [2, 0, 1])]
    df = spark.createDataFrame(rows, "ballot_id long, ballot array<int>")
    out = condorcet(df).collect()
    assert len(out) == 1
    assert out[0]["key"] == "0,1,2,"
    assert out[0]["value"] == " have the highest condorcet counts, no winner."


def test_condorcet_wins_includes_zero_win_candidates(spark):
    # Everyone agrees: 0 > 1 > 2. wins = [2, 1, 0]; candidate 2 appears.
    rows = [(0, [0, 1, 2]), (1, [0, 1, 2])]
    df = spark.createDataFrame(rows, "ballot_id long, ballot array<int>")
    got = {r["candidate"]: r["wins"] for r in condorcet_wins(df).collect()}
    assert got == {0: 2, 1: 1, 2: 0}


def test_condorcet_rank_ties_vote_for_neither(spark):
    """Two candidates sharing a rank in a ballot must not vote either
    way for that pair (the raw-rank semantics round1's oracle uses) —
    flattening ties into list order silently favours smaller ids."""
    from pyspark.sql import functions as F

    from distributed_computing_projects_spark.operators.condorcet import (
        pairwise_preferences,
    )

    # ballot 1: candidates 0 and 1 TIED at rank 1, candidate 2 at rank 2
    # ballot 2: strict order 1 < 0 < 2
    rows = [
        (1, [(1, 0), (1, 1), (2, 2)]),
        (2, [(1, 1), (2, 0), (3, 2)]),
    ]
    df = spark.createDataFrame(
        rows, "ballot_id long, ballot array<struct<r: int, s: int>>"
    ).select("ballot_id", F.expr("array_sort(ballot)").alias("ballot"))
    got = {(r.a, r.b): (r.a_pref, r.b_pref, r.winner)
           for r in pairwise_preferences(df, ranked=True).collect()}
    # (0,1): ballot1 tie -> no vote; ballot2 prefers 1 -> b_pref=1
    assert got[(0, 1)] == (0, 1, 1)
    # (0,2) and (1,2): both ballots strictly prefer the smaller id
    assert got[(0, 2)] == (2, 0, 0)
    assert got[(1, 2)] == (2, 0, 1)
