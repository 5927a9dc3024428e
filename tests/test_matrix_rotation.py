"""The generated matrix order must stay current: a code change that
moves a query into the needs-a-driver-row segments (never-green /
changed-since-last-green) fails here until
``python tools/matrix_rotation.py order`` is re-run — the automation
the hand-curated list lacked when it twice left changed queries on
stale green rows (r3: token_stats; r4: the NTZ streaming six)."""

from __future__ import annotations

import importlib.util
import os

MATRIX_CAP = 50  # rows the driver records per round (observed r1-r4)


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


def test_needy_queries_fit_the_matrix_cap():
    """Every query needing a fresh driver verdict must land inside the
    rows the driver will actually record."""
    from distributed_computing_projects_spark.queries._matrix_first import (
        GENERATED_FROM_ROUNDS,
    )

    order, reasons = _tool().compute_order(GENERATED_FROM_ROUNDS)
    needy = [q for q in order if reasons[q] == "never green"
             or reasons[q].startswith(("changed", "bootstrap"))]
    for q in needy:
        assert order.index(q) < MATRIX_CAP, (
            f"{q} needs a driver row ({reasons[q]}) but sits at "
            f"position {order.index(q)} >= cap {MATRIX_CAP}"
        )


def test_registry_order_follows_generated_file():
    from distributed_computing_projects_spark.queries import load_registry
    from distributed_computing_projects_spark.queries._matrix_first import (
        MATRIX_ORDER,
    )

    got = list(load_registry())
    known = [q for q in MATRIX_ORDER if q in got]
    assert got[: len(known)] == known
