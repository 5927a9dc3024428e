"""Automated correctness-matrix rotation.

The driver records ~50 CORRECTNESS rows per round over a 90+ query
registry, in registration order. Twice (r3: token_stats; r4: the six
NTZ-touched streaming queries) a hand-curated front-load list left a
CHANGED query riding on a stale green row. This tool removes the hand
from the loop:

- ``hash``: print each query's content hash — an md5 over (a) the
  AST-normalized source of the query function plus, transitively, the
  same-module functions it calls (docstring/comment edits don't churn
  it), (b) its oracle SQL, and (c) the AST-normalized sources of every
  package module reachable from the modules the function's code
  references through its module's import aliases (so an operator or
  fragment-builder edit flags every query whose Spark-side plan it can
  affect, while an edit to an unrelated operator doesn't).
- ``snapshot <round>``: record current hashes as the code state the
  driver's round-``<round>`` matrix ran against
  (``tools/query_hashes.json``). Run at END of each round, right
  before the final commit the driver evaluates.
- ``order``: compute the matrix order and write it to
  ``queries/_matrix_first.py`` (``order --dry-run`` prints the
  segment counts without touching the file — the read-only status
  check for judges and builders). Segments:
    0. queries with NO green driver row in any CORRECTNESS_r*.json;
    1. queries needing re-verification: current hash differs from the
       hash at the last green round (per the snapshot taken that
       round), OR the last green round has no snapshot at all — the
       conservative fallback: without a snapshot, "unchanged since
       green" is unprovable, so the query is treated as changed
       (the r5 blind spot: r5-edited closures of r4-green queries
       missing from the old hand-curated force list silently rode
       stale rows). Ordered: proven-changed first (their green rows
       are KNOWN invalid), then pre-snapshot greens stalest-first.
    2. everything else, stalest green round first.
  Segment 1 can exceed the driver's ~50-row cap in the round that
  first applies the conservative rule; overflow is drawn from the
  newest pre-snapshot greens and self-heals: every row the driver
  does record is snapshot-covered from then on.

``tests/test_matrix_rotation.py`` asserts the committed
``_matrix_first.py`` matches a fresh ``order`` computation, so any
code change that moves a query into segment 1 fails CI until the list
is regenerated — a changed query can no longer hide in the tail.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = "distributed_computing_projects_spark"
PKG_DIR = os.path.join(REPO, PKG)
SNAPSHOT_PATH = os.path.join(REPO, "tools", "query_hashes.json")
ORDER_PATH = os.path.join(PKG_DIR, "queries", "_matrix_first.py")

# Rows the driver records per round (observed 50 exactly, r1-r8). When
# the urgent segments (never-green + proven-changed) outgrow this —
# e.g. a round that adds many queries AND touches hot shared modules —
# the tail that cannot get a driver row this round is emitted as
# MATRIX_OVERFLOW so it is disclosed, pytest-verified against the
# DuckDB oracle locally (tests/test_matrix_rotation.py), and first in
# line next round.
MATRIX_CAP = 50

# Ordering hint only — NEVER affects segment membership (the
# conservative no-snapshot-at-green rule does that). These are the
# pre-snapshot greens whose import closures are KNOWN to have been
# edited in r5 (VERDICT r5 "What's wrong" #1: the r5 edits the old
# BOOTSTRAP_FORCE list missed), so within the pre-snapshot group they
# verify before queries that are merely stale. Dead weight to delete
# once every query has a green row at a snapshotted round (expected
# after r6/r7).
PRE_SNAPSHOT_PRIORITY = [
    "chunk_documents",
    "language_id",
    "maplejuice_wordcount",
    "pii_redact",
    "text_quality",
    "token_stats",
    "token_stats_bpe",
]


# ---------------------------------------------------------------------------
# Module graph + normalized hashing
# ---------------------------------------------------------------------------

def _pkg_modules() -> dict[str, str]:
    """dotted module name -> file path, for every module in the package."""
    out = {}
    for root, _dirs, files in os.walk(PKG_DIR):
        for f in files:
            if f.endswith(".py"):
                path = os.path.join(root, f)
                rel = os.path.relpath(path, REPO)[:-3].replace(os.sep, ".")
                out[rel] = path
    return out


class _DocStripper(ast.NodeTransformer):
    def _strip(self, node):
        if (node.body and isinstance(node.body[0], ast.Expr)
                and isinstance(node.body[0].value, ast.Constant)
                and isinstance(node.body[0].value.value, str)):
            node.body = node.body[1:] or [ast.Pass()]
        return node

    def visit_FunctionDef(self, node):
        self.generic_visit(node)
        return self._strip(node)

    visit_AsyncFunctionDef = visit_FunctionDef

    def visit_ClassDef(self, node):
        self.generic_visit(node)
        return self._strip(node)

    def visit_Module(self, node):
        self.generic_visit(node)
        return self._strip(node)


def _normalize(source: str) -> str:
    """Comment- and docstring-insensitive canonical form."""
    tree = ast.parse(source)
    return ast.unparse(_DocStripper().visit(tree))


def _module_imports(path: str) -> set[str]:
    """Package-internal modules imported by the file at ``path``."""
    tree = ast.parse(open(path).read())
    found = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(PKG):
                    found.add(a.name)
        elif isinstance(node, ast.ImportFrom) and node.module and node.module.startswith(PKG):
            found.add(node.module)
            for a in node.names:
                found.add(f"{node.module}.{a.name}")
    return found


def _import_closure(mod: str, modules: dict[str, str],
                    graph_cache: dict[str, set[str]]) -> set[str]:
    seen, stack = set(), [mod]
    while stack:
        m = stack.pop()
        if m in seen or m not in modules:
            continue
        seen.add(m)
        if m not in graph_cache:
            graph_cache[m] = _module_imports(modules[m])
        stack.extend(graph_cache[m])
    return seen


def _alias_map(path: str, modules: dict[str, str]) -> dict[str, str]:
    """local name -> package module it binds (``import ... as D`` etc.)."""
    tree = ast.parse(open(path).read())
    out = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name in modules:
                    out[(a.asname or a.name).split(".")[0]] = a.name
        elif isinstance(node, ast.ImportFrom) and node.module and node.module.startswith(PKG):
            for a in node.names:
                dotted = f"{node.module}.{a.name}"
                if dotted in modules:
                    out[a.asname or a.name] = dotted
    return out


def _module_functions(path: str) -> dict[str, str]:
    """top-level def name -> source segment."""
    src = open(path).read()
    tree = ast.parse(src)
    return {
        node.name: ast.get_source_segment(src, node)
        for node in tree.body
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
    }


def query_hashes() -> dict[str, str]:
    from distributed_computing_projects_spark.queries import load_registry

    modules = _pkg_modules()
    graph_cache: dict[str, set[str]] = {}
    mod_hash_cache: dict[str, str] = {}
    alias_cache: dict[str, dict[str, str]] = {}
    fns_cache: dict[str, dict[str, str]] = {}

    def mod_hash(m: str) -> str:
        if m not in mod_hash_cache:
            mod_hash_cache[m] = hashlib.md5(
                _normalize(open(modules[m]).read()).encode()
            ).hexdigest()
        return mod_hash_cache[m]

    out = {}
    for name, spec in load_registry().items():
        qmod = spec.fn.__module__
        qpath = modules[qmod]
        if qpath not in alias_cache:
            alias_cache[qpath] = _alias_map(qpath, modules)
            fns_cache[qpath] = _module_functions(qpath)
        aliases, fns = alias_cache[qpath], fns_cache[qpath]

        # the fn source plus same-module functions it calls, transitively
        snippets, todo, done = [], [spec.fn.__name__], set()
        while todo:
            f = todo.pop()
            if f in done or f not in fns:
                continue
            done.add(f)
            snippets.append(fns[f])
            for called in re.findall(r"\b(\w+)\s*\(", fns[f]):
                if called in fns:
                    todo.append(called)
        body = "\n".join(_normalize(s) for s in sorted(snippets))

        # package modules the snippet code can reach
        reach = set()
        for alias, mod in aliases.items():
            if re.search(rf"\b{re.escape(alias)}\b", body):
                reach |= _import_closure(mod, modules, graph_cache)
        dep_hashes = "".join(mod_hash(m) for m in sorted(reach))

        out[name] = hashlib.md5(
            (body + "\x00" + (spec.oracle or "") + "\x00" + dep_hashes).encode()
        ).hexdigest()
    return out


# ---------------------------------------------------------------------------
# Correctness history
# ---------------------------------------------------------------------------

def correctness_rounds() -> list[int]:
    return sorted(
        int(m.group(1))
        for f in os.listdir(REPO)
        if (m := re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f))
    )


def green_rounds(rounds: list[int] | None = None) -> dict[str, int]:
    """query -> latest round with a green driver row (hash_match, or
    rows+schema for oracle-less queries). ``rounds`` restricts which
    CORRECTNESS files count — the generated order file records the
    rounds it saw, so the currency test stays reproducible after the
    driver adds a new round's file."""
    from distributed_computing_projects_spark.queries import load_registry

    registry = load_registry()
    out: dict[str, int] = {}
    for rnd in rounds if rounds is not None else correctness_rounds():
        f = f"CORRECTNESS_r{rnd:02d}.json"
        if not os.path.exists(os.path.join(REPO, f)):
            f = f"CORRECTNESS_r{rnd}.json"
        rows = json.load(open(os.path.join(REPO, f)))
        for q, row in rows.items():
            if q not in registry:
                continue
            if registry[q].oracle is None:
                # rows-only-by-design: the driver records err='no_oracle'
                # with the produced row count — that IS its green row
                ok = (row.get("err") in (None, "no_oracle")
                      and row.get("spark_rows") is not None)
            else:
                ok = not row.get("err") and row.get("hash_match")
            if ok:
                out[q] = max(out.get(q, 0), rnd)
    return out


def load_snapshots() -> dict[str, dict[str, str]]:
    if os.path.exists(SNAPSHOT_PATH):
        return json.load(open(SNAPSHOT_PATH)).get("rounds", {})
    return {}


# ---------------------------------------------------------------------------
# Ordering
# ---------------------------------------------------------------------------

def compute_order(
    rounds: list[int] | None = None,
) -> tuple[list[str], dict[str, str]]:
    from distributed_computing_projects_spark.queries import load_registry, REGISTRY

    load_registry()
    names = list(REGISTRY)  # raw registration order, no front-load applied
    hashes = query_hashes()
    greens = green_rounds(rounds)
    snaps = load_snapshots()

    reasons: dict[str, str] = {}

    def sort_key(q: str) -> tuple:
        g = greens.get(q)
        if g is None:
            reasons[q] = "never green"
            return (0, 0, 0, q)
        snap = snaps.get(str(g))
        if snap is not None and q in snap:
            if snap[q] != hashes[q]:
                # green row exists but the code it ran against differs
                # from today's — the row is KNOWN invalid, verify first
                reasons[q] = f"changed since green r{g}"
                return (1, 0, g, q)
            reasons[q] = f"green r{g}"
            return (2, 0, g, q)
        # no snapshot at the green round — but ANY later snapshot whose
        # recorded hash differs from today's proves a change after that
        # round (> g), i.e. the green row is KNOWN invalid. Checking
        # every later snapshot (not just the latest) matters: the
        # round-close snapshot matches current code by construction,
        # and must not launder a mid-round edit that an earlier
        # snapshot still witnesses.
        for r in sorted((int(r) for r in snaps if int(r) > g
                         and q in snaps[str(r)])):
            if snaps[str(r)][q] != hashes[q]:
                reasons[q] = (f"changed since r{r} snapshot "
                              f"(green r{g} pre-snapshot)")
                return (1, 0, g, q)
        # conservative fallback: "unchanged since green" is unprovable —
        # treat as changed. Known-edited closures (PRE_SNAPSHOT_PRIORITY)
        # verify before merely-stale ones; both groups stalest-green-first.
        sub = 1 if q in PRE_SNAPSHOT_PRIORITY else 2
        reasons[q] = f"pre-snapshot green r{g} — conservative re-verify"
        return (1, sub, g, q)

    # tie-break by NAME, not registration index: REGISTRY order depends
    # on which module a caller happened to import first (e.g. a test
    # importing queries.extensions directly), and the generated order
    # must be identical no matter who computes it
    keys = {q: sort_key(q) for q in names}
    order = sorted(names, key=keys.__getitem__)
    return order, reasons


def write_order(dry_run: bool = False) -> None:
    rounds = correctness_rounds()
    order, reasons = compute_order(rounds)
    lines = [
        '"""GENERATED by tools/matrix_rotation.py — do not hand-edit.',
        "",
        "Matrix order for the driver's ~50-row correctness matrix:",
        "queries needing a fresh driver verdict first (never-green, then",
        "changed-since-last-green), then the rest stalest-first. Regenerate",
        "with `python tools/matrix_rotation.py order` after code changes;",
        "tests/test_matrix_rotation.py fails until this file is current.",
        '"""',
        "",
        f"GENERATED_FROM_ROUNDS = {rounds!r}",
        "",
        "MATRIX_ORDER = [",
    ]
    for q in order:
        lines.append(f"    {q!r},  # {reasons[q]}")
    lines.append("]")
    overflow = [
        q for i, q in enumerate(order)
        if i >= MATRIX_CAP
        and (reasons[q] == "never green" or reasons[q].startswith("changed"))
    ]
    never_green_past_cap = [q for q in overflow
                            if reasons[q] == "never green"]
    if never_green_past_cap:
        # a never-green query has NO prior correctness evidence at all;
        # disclosing it in the overflow list is not enough — hard-fail
        # so the round cannot close without restructuring (fewer new
        # queries, or verified-green segments freed up)
        raise SystemExit(
            f"never-green queries past the {MATRIX_CAP}-row driver cap "
            f"(cannot get a first driver row this round): "
            f"{never_green_past_cap}"
        )
    lines += [
        "",
        "# Urgent queries past the driver's row budget this round: no",
        "# driver row until next round; oracle-verified in pytest instead",
        "# (tests/test_matrix_rotation.py::test_overflow_queries_verify).",
        f"MATRIX_OVERFLOW = {overflow!r}",
    ]
    if dry_run:
        print(f"dry-run: would write {ORDER_PATH} ({len(order)} queries)")
    else:
        with open(ORDER_PATH, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {ORDER_PATH} ({len(order)} queries)")
    if overflow:
        print(f"WARNING: {len(overflow)} urgent queries past the "
              f"{MATRIX_CAP}-row cap: {overflow}")
    n_new = sum(1 for q in order if reasons[q] == "never green")
    n_chg = sum(1 for q in order if reasons[q].startswith("changed"))
    n_pre = sum(1 for q in order if reasons[q].startswith("pre-snapshot"))
    print(f"segments: {n_new} never-green, {n_chg} changed, {n_pre} "
          f"pre-snapshot, {len(order) - n_new - n_chg - n_pre} stale-rotation")


def snapshot(rnd: int) -> None:
    snaps = load_snapshots()
    snaps[str(rnd)] = query_hashes()
    with open(SNAPSHOT_PATH, "w") as f:
        json.dump({"rounds": snaps}, f, indent=1, sort_keys=True)
    print(f"snapshotted {len(snaps[str(rnd)])} query hashes as round {rnd}")


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "order"
    if cmd == "hash":
        for q, h in query_hashes().items():
            print(f"{h}  {q}")
    elif cmd == "snapshot":
        snapshot(int(sys.argv[2]))
    elif cmd == "order":
        # --dry-run: report segments without touching the generated
        # file (judges/builders running a read-only status check must
        # not dirty the tree)
        write_order(dry_run="--dry-run" in sys.argv[2:])
    else:
        print(__doc__)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
