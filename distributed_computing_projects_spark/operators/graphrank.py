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


# STRICTLY above this many iterations, every LINEAGE_PERSIST_ITERS-th
# iterate is EAGERLY localCheckpoint'ed: each round nests (join + agg)
# one level deeper and Catalyst analysis cost grows with plan depth;
# checkpointing actually truncates the logical plan (persist() — the
# r16 shape — did not: it neither materialized without an action nor
# cut the analyzed plan, per the r16 ADVICE audit). At the default 3
# rounds the linear lineage is shallow and the checkpoint action's
# ~0.2 s/round overhead is skipped. localCheckpoint trades fault
# recovery for speed — the dedup.neardup_clusters caveat applies
# (swap in checkpoint() + setCheckpointDir for multi-hour runs).
LINEAGE_PERSIST_ITERS = 4


def pagerank_fixedpoint(
    edges: DataFrame, n_iters: int = N_ITERS
) -> DataFrame:
    """``n_iters`` power iterations of integer fixed-point PageRank
    over a directed edge table ``(src, dst)`` with no dangling nodes
    (callers guarantee every node has an out-edge; :func:`click_graph`
    does by construction).

    Returns ``(node, degree, rank)`` — out-degree and the final
    BIGINT rank, both exact in any engine and any execution order.

    Plan shape (re-derived in the r16 optimization round): the node
    set IS the degree table's key set (every node has an out-edge),
    so ``nodes`` projects from ``deg`` instead of paying a separate
    distinct exchange, and the per-edge degree is joined ONCE into a
    persisted ``(src, dst, d)`` edge table instead of re-joining
    ``deg`` every round — one equi-join per iteration instead of two.
    Every remaining per-round exchange is the destination hash
    aggregate plus the rank-join shuffle; measured 10.4 -> 3.2 s at
    sf0.1/local[32], bit-identical output (the arithmetic is
    untouched and BIGINT sums are order-free). At 100 TB the
    ``(src, dst, d)`` table doubles the persisted edge footprint by a
    BIGINT per edge — the round-trip it saves is three edge-sized
    shuffles of the degree join; callers that cannot afford the
    footprint would bucket the edge table by ``src`` instead."""
    edges = edges.persist()
    deg = edges.groupBy("src").agg(
        F.count("*").cast("bigint").alias("d")
    ).persist()
    n = deg.count()  # driver scalar: one count of a node-sized table
    if n == 0:
        # empty graph (e.g. an events table with no parsable clicks):
        # empty result, not a ZeroDivisionError on the driver
        return deg.select(
            F.col("src").alias("node"),
            F.lit(0).cast("bigint").alias("degree"),
            F.lit(0).cast("bigint").alias("rank"),
        )
    # distinct sources == the node set (no-dangling contract), already
    # aggregated: no extra distinct exchange
    nodes = deg.select(F.col("src").alias("node"))
    # degree rides the edge row once; iterations stop re-joining deg
    ed = edges.join(deg, "src").persist()
    base = (3 * SCALE) // (DAMP_DEN * n)  # (1-d)*SCALE/N, floored
    # The rank table never materializes between rounds: round t's
    # rank is base + coalesce(s_t, 0) where s_t is round t's
    # destination sum, so the NEXT round's contribution folds that
    # expression into a LEFT join of ed against s_t directly — the
    # per-round nodes join disappears, and round 1 (rank == the
    # uniform SCALE DIV n constant) needs no join at all. Identical
    # BIGINT arithmetic, per-round plan = one left equi-join + one
    # hash aggregate.
    truncate_lineage = n_iters > LINEAGE_PERSIST_ITERS
    summed = None
    for it in range(n_iters):
        if summed is None:
            contrib = ed.select(
                "dst",
                F.expr(f"(CAST({SCALE // n} AS BIGINT)"
                       f" * {DAMP_NUM})"
                       f" DIV ({DAMP_DEN} * d)").alias("c"),
            )
        else:
            # summed derives from ed, so the join is a self-join by
            # lineage: the aggregate key is renamed to keep every
            # output column name unambiguous
            contrib = (
                ed.join(summed, F.col("src") == F.col("sdst"),
                        "left")
                .select(
                    F.col("dst"),
                    F.expr(
                        f"((CAST({base} AS BIGINT)"
                        f" + coalesce(s, CAST(0 AS BIGINT)))"
                        f" * {DAMP_NUM}) DIV ({DAMP_DEN} * d)"
                    ).alias("c"),
                )
            )
        summed = contrib.groupBy("dst").agg(
            F.sum("c").cast("bigint").alias("s")
        ).withColumnRenamed("dst", "sdst")
        if truncate_lineage and (it + 1) % LINEAGE_PERSIST_ITERS == 0:
            # eager checkpoint: materializes the node-sized iterate
            # (one small job) and REPLACES its nested logical plan
            # with the materialized RDD, so analysis cost stays
            # bounded however far callers crank --iters; superseded
            # checkpoint blocks are dropped by Spark's ContextCleaner
            # as the old frames go unreferenced
            summed = summed.localCheckpoint()
    if summed is None:  # n_iters == 0: the uniform initial rank
        r = nodes.withColumn(
            "r", F.lit(SCALE // n).cast("bigint"))
    else:
        r = (
            nodes.join(summed, nodes["node"] == summed["sdst"],
                       "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("bigint")
                .alias("r"),
            )
        )
    return (
        r.join(deg, r["node"] == deg["src"])
        .select("node", F.col("d").alias("degree"), F.col("r").alias("rank"))
    )
