"""Store parameter sidecars: every partitioned ANN/band store records
the parameters it was written with, and probes resolve them from the
store instead of trusting the caller.

Why: a hive-partitioned store is only correct to probe with the EXACT
parameters it was bucketed with — probing a ``write_bucketed_auto``
store with the wrong ``n_planes`` doesn't error, it prunes to the
wrong directories and returns confidently wrong top-k. At 100 TB, with
stores written months earlier by auto-sizing code, that silent
mismatch is the likeliest operational failure in the ANN family. The
catalog solved the same problem for dataset formats with its
``_format`` sidecar (catalog.py); this module is that pattern for
store parameters.

Contract:

- writers call :func:`write_params` inside the store directory right
  after the parquet write (underscore-prefixed filename, so Spark's
  file listing ignores it);
- probes call :func:`resolve` with every parameter defaulted to
  ``None``: ``None`` means "read the sidecar" (raises if the store has
  none — a pre-sidecar store needs explicit values), an explicit value
  is an override that RAISES on mismatch with the sidecar rather than
  silently probing wrong directories;
- appenders (``bandstore.append_bands``) resolve the same way, so an
  epoch can never be written with different bucketing than the store.

Reference parity note: the reference's SDFS is format- and
parameter-blind raw bytes (mp3/src/sdfs.go:108-178); this is
BASELINE.json scale-extension surface.
"""

from __future__ import annotations

import json
import os
import uuid

PARAMS_FILE = "_params"


class LocalFS:
    """Filesystem seam for store metadata and commit operations.

    Every storemeta function routes its IO through an FS object so
    the pointer-mode commit (already the object-store SHAPE — see
    :func:`commit_swap_versioned`) can target a real object store by
    supplying an implementation whose ``replace_text`` is the S3
    conditional PUT / GCS generation-match put. Paths are treated as
    opaque strings joined with ``/`` — never ``os.path`` semantics —
    so ``s3a://bucket/store`` flows through unmangled (the tests
    parameterize the pointer-swap suite over a scheme-prefixed FS to
    pin that). The sandbox has no object store, so only this local
    implementation runs here; Spark itself reads whatever URL scheme
    its hadoop conf enables (``session.hadoop_conf_from_env``)."""

    def join(self, base: str, *parts: str) -> str:
        return "/".join([base.rstrip("/"), *parts])

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def rmtree(self, path: str) -> None:
        import shutil

        shutil.rmtree(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def read_text(self, path: str) -> str | None:
        """File contents, or None when missing."""
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return f.read()

    def replace_text(self, path: str, text: str) -> None:
        """Atomically replace ``path`` with ``text`` — readers see the
        old contents or the new, never a torn write. Locally a temp
        file + ``os.replace``; on an object store, the conditional
        PUT of the same small object (THE commit primitive)."""
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)


LOCAL = LocalFS()


class StoreParamsError(ValueError):
    """Missing or mismatched store parameters (see module doc)."""


def write_params(path: str, kind: str, params: dict,
                 fs: LocalFS = LOCAL) -> None:
    """Record ``params`` as the store's write parameters (atomic
    replace of the sidecar object)."""
    meta = {"kind": kind, **params}
    fs.replace_text(fs.join(path, PARAMS_FILE), json.dumps(meta))


def read_params(path: str, fs: LocalFS = LOCAL) -> dict | None:
    """The store's recorded parameters, or None for a pre-sidecar
    store."""
    text = fs.read_text(fs.join(path, PARAMS_FILE))
    return None if text is None else json.loads(text)


def resolve(path: str, kind: str, overrides: dict) -> dict:
    """Effective probe parameters for the store at ``path``.

    ``overrides`` maps parameter name -> caller-supplied value or
    ``None``. With a sidecar present: the store ``kind`` must match,
    and every non-``None`` override must equal the recorded value
    (raises :class:`StoreParamsError` otherwise — an explicit wrong
    value must never silently probe wrong directories). Without a
    sidecar: every override must be supplied explicitly (pre-sidecar
    compatibility path)."""
    meta = read_params(path)
    if meta is None:
        missing = [k for k, v in overrides.items() if v is None]
        if missing:
            raise StoreParamsError(
                f"store at {path} has no {PARAMS_FILE} sidecar and no "
                f"explicit value for {missing}; pass the write-time "
                f"value(s) or rewrite the store with a sidecar-writing "
                f"writer"
            )
        return dict(overrides)
    if meta.get("kind") != kind:
        raise StoreParamsError(
            f"store at {path} was written as kind={meta.get('kind')!r}, "
            f"probed as kind={kind!r}"
        )
    out = {}
    for k, v in overrides.items():
        if k not in meta:
            raise StoreParamsError(
                f"store sidecar at {path} records no {k!r} (has "
                f"{sorted(meta)}); the store predates this parameter — "
                f"rewrite it"
            )
        if v is not None and v != meta[k]:
            raise StoreParamsError(
                f"store at {path} was written with {k}={meta[k]!r} but "
                f"probed with {k}={v!r} — a mismatched probe prunes to "
                f"the wrong directories and returns wrong results"
            )
        out[k] = meta[k]
    return out


def compact_partitioned_store(spark, path: str, kind: str,
                              partition_col: str | list[str],
                              dedup_cols: list[str]) -> tuple[int, int]:
    """Shared compaction for sidecar-carrying hive-partitioned stores:
    rewrite distinct-on-``dedup_cols`` into a sibling ``__compact__``
    directory (same partition layout, sidecar re-recorded), verify
    readable, and swap in with two directory renames — probes see the
    old store or the compacted one, never a partial rewrite. A crash
    between the renames leaves the full pre-compact store at
    ``<path>.__pre_compact__``; recovery is renaming it back. Returns
    ``(rows_before, rows_after)``.

    Why stores need this at all: epochal appenders (bandstore, IVF)
    are deliberately at-least-once — a foreachBatch retry can land the
    same rows twice (benign for probe correctness, monotonic for store
    size) — and every append adds one file per touched directory, so
    long-running ingest accumulates small files. One rewrite fixes
    both. Scale shape: one store scan + one hash exchange on the
    partition column (each directory rewritten by one task)."""
    import shutil

    parts = ([partition_col] if isinstance(partition_col, str)
             else list(partition_col))
    meta = read_params(path)
    if meta is None or meta.get("kind") != kind:
        raise StoreParamsError(
            f"compact: {path!r} has no {kind!r} sidecar"
        )
    store = spark.read.parquet(data_path(path))
    before = store.count()
    tmp = path.rstrip("/") + ".__compact__"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # leftover of a crashed prior compaction
    (
        store.dropDuplicates(dedup_cols)
        .repartition(*parts)
        .write.partitionBy(*parts)
        .mode("overwrite")
        .parquet(tmp)
    )
    write_params(tmp, kind, {k: v for k, v in meta.items()
                             if k not in ("kind", VERSION_KEY)})
    after = spark.read.parquet(tmp).count()
    # the store's own sidecar declares its commit backend: a version
    # field means pointer mode (object-store shape), absent means the
    # default local rename mode
    if VERSION_KEY in meta:
        commit_swap_versioned(path, tmp)
    else:
        commit_swap(path, tmp)
    return before, after


def commit_swap(path: str, tmp: str) -> None:
    """THE commit step of store compaction: replace the live store at
    ``path`` with the verified rewrite at ``tmp``. Everything before
    this call is re-runnable scratch work; this is the only moment the
    store's visible state changes, and it is the one seam whose
    implementation is filesystem-specific.

    Local-filesystem implementation (this one): two directory renames
    with a crash-recoverable intermediate —
    ``path`` -> ``path.__pre_compact__``, ``tmp`` -> ``path``, then
    delete the pre-compact copy. A reader that lists ``path`` between
    the renames sees FileNotFoundError (acceptable here: compaction
    runs inside the sequential foreachBatch loop, so nothing probes
    concurrently); a crash at any point leaves either the old store at
    ``path``/``path.__pre_compact__`` or the verified new one at
    ``tmp``/``path`` — :func:`recover_swap` repairs every such state.

    Object-store contract (S3/GCS have no directory rename): the
    POINTER-SWAP backend, implemented below as
    :func:`commit_swap_versioned` — stores become versioned
    directories (``<store>/v=<n>/``), the ``_params`` sidecar gains a
    ``version`` field, the commit is one atomic replace of the sidecar
    (locally ``os.replace``; on S3/GCS the conditional PUT /
    generation-match put of the same small object), readers resolve
    the data directory through :func:`data_path`, and superseded
    versions are garbage-collected after the pointer flip (a real
    object store would add a grace period for in-flight readers).
    :func:`compact_partitioned_store` picks the backend from the
    store's own sidecar; :func:`convert_to_versioned` migrates a
    rename-mode store in place.
    """
    import shutil

    old = path.rstrip("/") + ".__pre_compact__"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def recover_swap(path: str) -> str:
    """Repair a store whose :func:`commit_swap` was interrupted.
    Idempotent; safe to call on a healthy store. Returns what it did:

    - ``"completed"`` — crash landed between the two renames with the
      verified rewrite still at ``<path>.__compact__``: roll FORWARD
      (the rewrite passed its read-back verification before the swap
      began, so finishing is strictly better than rolling back);
    - ``"rolled_back"`` — ``path`` missing and no verified rewrite:
      restore ``<path>.__pre_compact__``;
    - ``"cleaned"`` — swap finished but the pre-compact copy or a
      stale rewrite was left behind: delete the leftovers;
    - ``"noop"`` — store healthy, nothing left over.
    """
    import shutil

    old = path.rstrip("/") + ".__pre_compact__"
    tmp = path.rstrip("/") + ".__compact__"
    if not os.path.exists(path):
        if os.path.exists(tmp) and read_params(tmp) is not None:
            os.rename(tmp, path)
            if os.path.exists(old):
                shutil.rmtree(old)
            return "completed"
        if os.path.exists(old):
            os.rename(old, path)
            return "rolled_back"
        raise StoreParamsError(
            f"recover_swap: nothing to recover at {path!r} — no store, "
            f"no pre-compact copy, no verified rewrite"
        )
    cleaned = False
    for leftover in (old, tmp):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)
            cleaned = True
    return "cleaned" if cleaned else "noop"


# ---------------------------------------------------------------------------
# Versioned-pointer backend: the object-store commit shape, as a
# second fully-working local mode (rename mode stays the default).
# ---------------------------------------------------------------------------

VERSION_KEY = "version"


def version_dir(path: str, n: int, fs: LocalFS = LOCAL) -> str:
    return fs.join(path, f"v={n}")


def data_path(path: str, fs: LocalFS = LOCAL) -> str:
    """The directory to READ for the store at ``path``: the pointed
    version directory for a pointer-mode store (sidecar carries
    ``version``), ``path`` itself for a rename-mode store. Readers of
    versioned stores must resolve through this instead of listing
    ``path`` directly — that indirection is the whole mechanism."""
    meta = read_params(path, fs)
    if meta is not None and VERSION_KEY in meta:
        return version_dir(path, meta[VERSION_KEY], fs)
    return path


def convert_to_versioned(path: str, fs: LocalFS = LOCAL) -> str:
    """Migrate a rename-mode store in place to the versioned-pointer
    layout: move its data entries into ``v=0/`` and rewrite the
    sidecar with ``version: 0`` (idempotent on an already-versioned
    store). Returns the new data directory."""
    meta = read_params(path, fs)
    if meta is None:
        raise StoreParamsError(
            f"convert_to_versioned: {path!r} has no {PARAMS_FILE} sidecar"
        )
    if VERSION_KEY in meta:
        return version_dir(path, meta[VERSION_KEY], fs)
    v0 = version_dir(path, 0, fs)
    fs.makedirs(v0)
    for entry in fs.listdir(path):
        if entry == PARAMS_FILE or entry.startswith("v="):
            continue
        fs.rename(fs.join(path, entry), fs.join(v0, entry))
    kind = meta.pop("kind")
    write_params(path, kind, {**meta, VERSION_KEY: 0}, fs)
    return v0


def commit_swap_versioned(path: str, tmp: str,
                          fs: LocalFS = LOCAL) -> None:
    """Pointer-mode commit: adopt the verified rewrite at ``tmp`` as
    the store's next version and flip the sidecar pointer. Three
    steps, each a crash cut point repaired by
    :func:`recover_swap_versioned`:

    1. move ``tmp`` to ``<path>/v=<n+1>`` (locally a rename; on an
       object store the rewrite targets the versioned prefix directly
       and this step disappears) — a crash here leaves an unreferenced
       version directory, invisible to readers;
    2. atomically replace ``_params`` with ``version: n+1``
       (``os.replace`` — the local analog of S3 conditional PUT / GCS
       generation-match; readers see the old pointer or the new one,
       never a torn one) — THE commit instant;
    3. delete superseded version directories (GC; a production object
       store adds a grace period for readers mid-list) — a crash here
       leaves garbage that never gets read.

    Unlike rename mode there is NO window where ``path`` does not
    exist: concurrent readers resolving :func:`data_path` always find
    a complete version directory."""
    meta = read_params(path, fs)
    if meta is None or VERSION_KEY not in meta:
        raise StoreParamsError(
            f"commit_swap_versioned: {path!r} is not a versioned store "
            f"(no {VERSION_KEY!r} in its sidecar) — use commit_swap, or "
            f"convert_to_versioned first"
        )
    n = int(meta[VERSION_KEY]) + 1
    vd = version_dir(path, n, fs)
    if fs.exists(vd):
        fs.rmtree(vd)  # leftover of a crashed prior attempt
    fs.rename(tmp, vd)
    kind = meta.pop("kind")
    write_params(path, kind, {**meta, VERSION_KEY: n}, fs)
    for entry in fs.listdir(path):
        if entry.startswith("v=") and entry != f"v={n}":
            fs.rmtree(fs.join(path, entry))


def recover_swap_versioned(path: str, fs: LocalFS = LOCAL) -> str:
    """Repair a versioned store whose :func:`commit_swap_versioned`
    was interrupted. Idempotent; safe on a healthy store. The pointer
    flip is atomic, so the sidecar always names exactly one committed
    version; repair is garbage-collecting everything else:

    - crash before the pointer flip -> the new version directory is
      unreferenced: deleted (the commit never happened — the rewrite
      at ``<path>.__compact__``, if still present, is also cleared,
      matching rename-mode ``recover_swap``'s treatment of scratch);
    - crash after the flip -> superseded version directories remain:
      deleted (the commit DID happen).

    Returns ``"cleaned"`` or ``"noop"``; raises if the pointed
    version directory itself is missing (that is data loss, not an
    interrupted swap)."""
    meta = read_params(path, fs)
    if meta is None or VERSION_KEY not in meta:
        raise StoreParamsError(
            f"recover_swap_versioned: {path!r} is not a versioned store"
        )
    n = int(meta[VERSION_KEY])
    if not fs.isdir(version_dir(path, n, fs)):
        raise StoreParamsError(
            f"recover_swap_versioned: {path!r} points at version {n} "
            f"but v={n} is missing — data loss, not an interrupted swap"
        )
    cleaned = False
    for entry in fs.listdir(path):
        if entry.startswith("v=") and entry != f"v={n}":
            fs.rmtree(fs.join(path, entry))
            cleaned = True
    tmp = path.rstrip("/") + ".__compact__"
    if fs.exists(tmp):
        fs.rmtree(tmp)
        cleaned = True
    return "cleaned" if cleaned else "noop"
