"""Fixed-point PageRank: exact integer iterates vs a pure-Python
reference, and shuffle-order invariance (operators/graphrank.py)."""

from __future__ import annotations

from distributed_computing_projects_spark.operators import graphrank as G


def _py_pagerank(edges: list[tuple[int, int]], n_iters: int) -> dict:
    """The same integer recurrence, driver-side."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = (3 * G.SCALE) // (G.DAMP_DEN * n)
    r = {v: G.SCALE // n for v in nodes}
    for _ in range(n_iters):
        s: dict[int, int] = {v: 0 for v in nodes}
        for src, dst in edges:
            s[dst] += (r[src] * G.DAMP_NUM) // (G.DAMP_DEN * deg[src])
        r = {v: base + s[v] for v in nodes}
    return r


def test_pagerank_matches_python_reference_exactly(spark):
    # asymmetric 4-node graph: a hub (1) pointed at by everyone, and
    # an asymmetric back-edge structure so ranks genuinely differ
    edges = [(2, 1), (3, 1), (4, 1), (1, 2), (2, 3), (3, 4), (4, 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: (r["degree"], r["rank"])
        for r in G.pagerank_fixedpoint(df).collect()
    }
    want_r = _py_pagerank(edges, G.N_ITERS)
    deg = {1: 1, 2: 2, 3: 2, 4: 2}
    assert got == {v: (deg[v], want_r[v]) for v in want_r}
    # ranks genuinely differ on this asymmetric graph (the exact-match
    # assert above would be vacuous on a symmetric one)
    assert len(set(want_r.values())) == len(want_r)


def test_pagerank_long_run_checkpoint_truncation_exact(spark):
    """n_iters past LINEAGE_PERSIST_ITERS crosses the r17 eager
    localCheckpoint boundary (the r16 persist gating neither
    materialized nor truncated — ADVICE audit); the checkpointed run
    must equal the pure-Python recurrence bit-for-bit."""
    edges = [(2, 1), (3, 1), (4, 1), (1, 2), (2, 3), (3, 4), (4, 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    n_iters = G.LINEAGE_PERSIST_ITERS + 2
    got = {r["node"]: r["rank"]
           for r in G.pagerank_fixedpoint(df, n_iters=n_iters).collect()}
    assert got == _py_pagerank(edges, n_iters)


def test_pagerank_invariant_under_partitioning(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    edges = G.click_graph(ev)
    a = {
        r["node"]: r["rank"]
        for r in G.pagerank_fixedpoint(edges.repartition(1)).collect()
    }
    b = {
        r["node"]: r["rank"]
        for r in G.pagerank_fixedpoint(edges.repartition(13)).collect()
    }
    assert a == b  # bit-exact, not approximately equal
    assert len(a) > 100  # users + items both present


def test_click_graph_is_bidirectional_bipartite(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    edges = G.click_graph(ev).collect()
    pairs = {(r["src"], r["dst"]) for r in edges}
    assert len(pairs) == len(edges)  # fwd/rev disjoint by parity
    for s, d in pairs:
        assert (d, s) in pairs  # symmetric
        assert s % 2 != d % 2  # bipartite: user (even) <-> item (odd)
