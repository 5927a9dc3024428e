"""The generated matrix order must stay current: a code change that
moves a query into the needs-a-driver-row segments (never-green /
changed-since-last-green / pre-snapshot-green) fails here until
``python tools/matrix_rotation.py order`` is re-run — the automation
the hand-curated list lacked when it twice left changed queries on
stale green rows (r3: token_stats; r4: the NTZ streaming six)."""

from __future__ import annotations

import importlib.util
import os

# rows the driver records per round — single source of truth in the
# generator (tools/matrix_rotation.py), read via _tool() below so a
# cap change cannot desynchronize generator and test
def _cap():
    return _tool().MATRIX_CAP


def _tool():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "matrix_rotation", os.path.join(repo, "tools", "matrix_rotation.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_matrix_order_file_is_current():
    from distributed_computing_projects_spark.queries._matrix_first import (
        GENERATED_FROM_ROUNDS,
        MATRIX_ORDER,
    )

    # recompute against the SAME correctness rounds the file recorded,
    # so the driver adding a new round's file doesn't fail this test —
    # only an un-regenerated code change does
    order, reasons = _tool().compute_order(GENERATED_FROM_ROUNDS)
    assert MATRIX_ORDER == order, (
        "stale queries/_matrix_first.py — a query's content hash or "
        "green-row state moved; run `python tools/matrix_rotation.py "
        "order` and commit the result"
    )


def test_urgent_queries_fit_the_matrix_cap():
    """Never-green and proven-changed queries (whose green rows are
    known invalid) must land ahead of everything else, and never-green
    queries must ALWAYS get a driver row. When the urgent segments
    outgrow the cap (a round that adds many queries and touches hot
    shared modules), the overflow past the cap must (a) consist only of
    proven-changed queries — never never-green, whose correctness has
    no prior evidence at all — and (b) be exactly the generated
    MATRIX_OVERFLOW list, which test_overflow_queries_verify then
    oracle-checks locally in lieu of the missing driver row."""
    from distributed_computing_projects_spark.queries._matrix_first import (
        GENERATED_FROM_ROUNDS,
        MATRIX_OVERFLOW,
    )

    order, reasons = _tool().compute_order(GENERATED_FROM_ROUNDS)

    def urgency(q):
        return (reasons[q] == "never green"
                or reasons[q].startswith("changed"))

    cap = _cap()
    urgent = [q for q in order if urgency(q)]
    # no urgent query may sit behind a non-urgent one
    assert order[:len(urgent)] == urgent, "urgent query behind non-urgent"
    # never-green always inside the cap (write_order hard-fails on
    # this too; the assertion catches a hand-edited file)
    for q in urgent:
        if reasons[q] == "never green":
            assert order.index(q) < cap, (
                f"never-green {q} at position {order.index(q)} "
                f">= cap {cap}"
            )
    overflow = [q for q in urgent if order.index(q) >= cap]
    assert overflow == MATRIX_OVERFLOW, (
        "stale MATRIX_OVERFLOW — run `python tools/matrix_rotation.py "
        "order` and commit the result"
    )


def test_overflow_queries_verify(spark, sf_dir):
    """Every urgent query the driver cannot row this round is
    oracle-verified HERE, so pytest green still certifies it."""
    from distributed_computing_projects_spark.queries._matrix_first import (
        MATRIX_OVERFLOW,
    )
    from distributed_computing_projects_spark.verify import run

    if not MATRIX_OVERFLOW:
        return
    failed = run(spark, sf_dir, only=set(MATRIX_OVERFLOW))
    assert not failed, f"overflow queries failed oracle verify: {failed}"


def test_pre_snapshot_green_is_treated_as_changed():
    """The conservative fallback (VERDICT r5 'What's wrong' #1): a
    query whose last green round has NO snapshot cannot prove itself
    unchanged, so it must sort into the needs-verification segment —
    ahead of every snapshot-confirmed green — regardless of any
    hand-curated list."""
    tool = _tool()
    hashes = tool.query_hashes()
    greens = tool.green_rounds()
    snaps = tool.load_snapshots()
    # pick any query green at a snapshotted round vs one green at an
    # un-snapshotted round; synthesize if the repo state lacks either
    snap_rounds = {int(r) for r in snaps}
    pre = [q for q, g in greens.items() if g not in snap_rounds]
    post = [q for q, g in greens.items()
            if g in snap_rounds and q in snaps[str(g)]
            and snaps[str(g)][q] == hashes[q]]
    if not pre or not post:
        # backlog burned down (the goal state): simulate one pre-snapshot
        # green by dropping a query from every snapshot
        q0 = post[0]
        for snap in snaps.values():
            snap.pop(q0, None)
        tool.load_snapshots = lambda: snaps  # compute_order re-reads disk
        pre = [q0]
        post = post[1:]
        assert post, "need at least two green queries for this test"
    order, reasons = tool.compute_order()
    assert all(
        order.index(p) < order.index(s) for p in pre for s in post
    ), "pre-snapshot green must outrank snapshot-confirmed green"
    for p in pre:
        # either the conservative fallback, or the stronger verdict a
        # LATER snapshot proves (changed after that snapshot)
        assert reasons[p].startswith(("pre-snapshot", "changed since")), (
            reasons[p]
        )


def test_priority_list_never_affects_membership():
    """PRE_SNAPSHOT_PRIORITY is an ordering hint only: emptying it must
    not move any query across the needs-verification boundary."""
    tool = _tool()
    order, reasons = tool.compute_order()
    tool.PRE_SNAPSHOT_PRIORITY = []
    order2, reasons2 = tool.compute_order()
    needs = {q for q, r in reasons.items() if not r.startswith("green")}
    needs2 = {q for q, r in reasons2.items() if not r.startswith("green")}
    assert needs == needs2


def test_registry_order_follows_generated_file():
    from distributed_computing_projects_spark.queries import load_registry
    from distributed_computing_projects_spark.queries._matrix_first import (
        MATRIX_ORDER,
    )

    got = list(load_registry())
    known = [q for q in MATRIX_ORDER if q in got]
    assert got[: len(known)] == known


def test_round_close_snapshot_cannot_launder_midround_edits():
    """The round-close snapshot matches current code by construction;
    an edit made mid-round to a pre-snapshot-green query must STILL be
    proven changed by the earlier snapshot that witnessed the old hash
    (the bug: comparing only against the latest snapshot)."""
    tool = _tool()
    hashes = tool.query_hashes()
    q = next(iter(hashes))
    fake_snaps = {
        "5": {q: "0" * 32},        # witnessed a DIFFERENT hash
        "6": {q: hashes[q]},       # round-close snapshot: matches
    }
    tool.load_snapshots = lambda: fake_snaps
    # force q's green round to 4 (pre-snapshot) while keeping every
    # other query out of the way
    real_greens = tool.green_rounds

    def fake_greens(rounds=None):
        g = real_greens(rounds)
        g[q] = 4
        return g

    tool.green_rounds = fake_greens
    order, reasons = tool.compute_order()
    assert reasons[q] == "changed since r5 snapshot (green r4 pre-snapshot)"
