"""Fixed-point PageRank: iterative graph centrality as exact BIGINT
arithmetic.

Crawl pipelines weight documents by link centrality (Common Crawl
publishes harmonic-centrality / PageRank host rankings; Brin & Page
1998 is the algorithm). The engine-hard part is not the math — it is
that float PageRank sums contributions in shuffle order, so no two
runs (let alone two engines) agree at the bit level, and every
correctness check degrades to tolerances.

This implementation keeps every rank an INTEGER: ranks are scaled by
``SCALE`` (10^12), the damping factor is the rational 17/20, and each
edge contribution is one integer floor-division
``(r_src * 17) DIV (20 * d_src)`` summed as BIGINT. Integer addition
is associative and commutative, so ANY shuffle order, partitioning,
or engine produces bit-identical iterates — the rank VALUE itself is
hash-comparable, not just its order. The floor loses < 1 unit in
10^12 per edge per iteration (documented approximation; at
SCALE=10^12 that is far below any ranking-relevant gap).

Scale shape (the dedup_clusters discipline): one edge table
partitioned by source, per iteration one equi-join against the
node-sized rank table and one hash aggregate on the destination key —
plain distributive sums, no per-node collected state, so in-degree
skew is AQE/salting territory, not a memory cliff. The rank table is
node-sized and persists between iterations; production runs would
checkpoint every few rounds to truncate lineage exactly as
``dedup.neardup_clusters`` does.

Reference parity note: the reference engine has no graph surface;
scale-extension tier (SURVEY §7.1 M6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 17, 20  # damping 0.85 as an exact rational
N_ITERS = 3


def click_graph(events: DataFrame) -> DataFrame:
    """The user↔item interaction graph from click events: node ids
    encode users as ``2*user_id`` and items (the ``k`` JSON prop) as
    ``2*k + 1``; every distinct (user, item) click pair contributes
    BOTH directed edges, so the bipartite walk mixes and no node
    dangles (every node that appears has out-degree >= 1)."""
    pairs = (
        events.filter(F.col("event_type") == "click")
        .select(
            (F.col("user_id") * 2).alias("u"),
            (F.get_json_object("props", "$.k").cast("bigint") * 2 + 1)
            .alias("i"),
        )
        .filter(F.col("i").isNotNull())
        .distinct()
    )
    fwd = pairs.select(F.col("u").alias("src"), F.col("i").alias("dst"))
    rev = pairs.select(F.col("i").alias("src"), F.col("u").alias("dst"))
    return fwd.unionByName(rev)


def pagerank_fixedpoint(
    edges: DataFrame, n_iters: int = N_ITERS
) -> DataFrame:
    """``n_iters`` power iterations of integer fixed-point PageRank
    over a directed edge table ``(src, dst)`` with no dangling nodes
    (callers guarantee every node has an out-edge; :func:`click_graph`
    does by construction).

    Returns ``(node, degree, rank)`` — out-degree and the final
    BIGINT rank, both exact in any engine and any execution order."""
    edges = edges.persist()
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    n = nodes.count()  # driver scalar: one count of a node-sized table
    if n == 0:
        # empty graph (e.g. an events table with no parsable clicks):
        # empty result, not a ZeroDivisionError on the driver
        return nodes.select(
            "node",
            F.lit(0).cast("bigint").alias("degree"),
            F.lit(0).cast("bigint").alias("rank"),
        )
    deg = edges.groupBy("src").agg(
        F.count("*").cast("bigint").alias("d")
    )
    base = (3 * SCALE) // (DAMP_DEN * n)  # (1-d)*SCALE/N, floored
    r = nodes.withColumn("r", F.lit(SCALE // n).cast("bigint"))
    prev = None
    for _ in range(n_iters):
        contrib = (
            edges.join(r, edges["src"] == r["node"])
            .join(deg, "src")
            .select(
                "dst",
                F.expr(
                    f"(r * {DAMP_NUM}) DIV ({DAMP_DEN} * d)"
                ).alias("c"),
            )
        )
        summed = contrib.groupBy("dst").agg(
            F.sum("c").cast("bigint").alias("s")
        )
        r = (
            nodes.join(summed, nodes["node"] == summed["dst"], "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("bigint")
                .alias("r"),
            )
            # node-sized: keeping each iterate materialized keeps the
            # next round's plan shallow (3 rounds here; long runs
            # would checkpoint instead)
            .persist()
        )
        # superseded iterates must not accumulate in executor storage
        # when callers crank --iters: the new iterate is the only
        # consumer of the old one, so once the new one exists the old
        # handle can drop (blocking=False: lazily evicted; if the
        # final action recomputes through it the lineage is intact)
        if prev is not None:
            prev.unpersist()
        prev = r
    return (
        r.join(deg, r["node"] == deg["src"])
        .select("node", F.col("d").alias("degree"), F.col("r").alias("rank"))
    )
