"""Object-store seam, end-to-end: the band-store lifecycle (write ->
epoch append -> probe -> compact -> pointer commit -> crash recovery)
through a REAL non-``file://`` Hadoop filesystem — a ``viewfs://``
client-side mount, the one non-local scheme a hermetic container can
serve — plus the pointer lifecycle under OBJECT-STORE rename
semantics (copy+delete, crash injectable). Complements
tests/test_storefs.py's path-level fake: here Spark's parquet IO and
the py4j HadoopFS both run against the same non-local scheme, so any
``os.*`` bypass or scheme mangling in the store logic fails loudly."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from distributed_computing_projects_spark.operators import (
    bandstore,
    dedup as D,
    storemeta,
)
from distributed_computing_projects_spark.operators.storefs import (
    OBJECT_STORE_SCHEMES,
    HadoopFS,
)

MOUNT = "viewfs://dcptest/"
BASE = MOUNT + "data/store"


@pytest.fixture()
def viewfs(spark, tmp_path):
    """Mount ``viewfs://dcptest/data`` over a local root and hand back
    the HadoopFS bound to the mount."""
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "fs.viewfs.mounttable.dcptest.link./data", f"file://{tmp_path}"
    )
    fs = HadoopFS(spark, MOUNT)
    yield fs
    shutil.rmtree(tmp_path, ignore_errors=True)


def _docs(spark, ids, tag):
    rows = [(i, f"{tag} shared text body number {i} " * 6)
            for i in ids]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bandstore_pointer_lifecycle_over_viewfs(spark, viewfs, tmp_path):
    fs = viewfs
    assert fs.scheme == "viewfs" and fs.atomic_rename

    # -- write epoch 0 directly into pointer-mode layout ------------------
    kb_parts = 8
    epoch0 = bandstore.banded_rows(
        _docs(spark, range(20), "alpha"), "doc_id", "text", kb_parts)
    epoch0.write.partitionBy("kb").mode("overwrite").parquet(BASE + "/v=0")
    storemeta.write_params(
        BASE, bandstore.STORE_KIND,
        {"kb_parts": kb_parts, storemeta.VERSION_KEY: 0}, fs)
    assert storemeta.data_path(BASE, fs) == BASE + "/v=0"

    # -- epoch append through the pointer ---------------------------------
    epoch1 = bandstore.banded_rows(
        _docs(spark, range(20, 30), "alpha"), "doc_id", "text", kb_parts)
    epoch1.write.partitionBy("kb").mode("append").parquet(
        storemeta.data_path(BASE, fs))
    # the deliberate at-least-once retry: same epoch lands twice
    epoch1.write.partitionBy("kb").mode("append").parquet(
        storemeta.data_path(BASE, fs))
    store_rows = spark.read.parquet(storemeta.data_path(BASE, fs))
    n_raw = store_rows.count()
    assert n_raw == epoch0.count() + 2 * epoch1.count()

    # -- probe: a near-duplicate batch must hit its store twin ------------
    batch = bandstore.banded_rows(
        _docs(spark, [25], "alpha"), "doc_id", "text", kb_parts)
    store = spark.read.schema(batch.schema).parquet(
        storemeta.data_path(BASE, fs))
    pairs = D._incremental_join(
        batch.drop("kb"), store.drop("kb"), 0.9)
    assert pairs.filter("corpus_id = 25").count() == 1

    # -- compact rewrite + pointer commit, all on viewfs ------------------
    tmp = BASE + ".__compact__"  # sibling INSIDE the mount
    (store_rows.dropDuplicates(["id", "band", "key"])
     .repartition("kb").write.partitionBy("kb")
     .mode("overwrite").parquet(tmp))
    storemeta.write_params(
        tmp, bandstore.STORE_KIND, {"kb_parts": kb_parts}, fs)
    storemeta.commit_swap_versioned(BASE, tmp, fs)
    meta = storemeta.read_params(BASE, fs)
    assert meta[storemeta.VERSION_KEY] == 1
    assert not fs.exists(BASE + "/v=0") and not fs.exists(tmp)
    compacted = spark.read.parquet(storemeta.data_path(BASE, fs))
    assert compacted.count() == n_raw - epoch1.count()  # dup epoch gone
    # probe still lands after the swap
    store = spark.read.schema(batch.schema).parquet(
        storemeta.data_path(BASE, fs))
    assert D._incremental_join(
        batch.drop("kb"), store.drop("kb"), 0.9
    ).filter("corpus_id = 25").count() == 1

    # -- crash leftovers GC through the same seam -------------------------
    fs.makedirs(BASE + "/v=9")
    assert storemeta.recover_swap_versioned(BASE, fs) == "cleaned"
    assert storemeta.recover_swap_versioned(BASE, fs) == "noop"
    # the mount really is the local root (nothing silently went to /)
    assert os.path.isdir(tmp_path / "store" / "v=1")


def test_hadoopfs_replace_text_is_read_back_consistent(spark, viewfs):
    fs = viewfs
    path = MOUNT + "data/sidecar_probe"
    fs.makedirs(path)
    storemeta.write_params(path, "probe", {"n": 1}, fs)
    storemeta.write_params(path, "probe", {"n": 2}, fs)  # overwrite path
    assert storemeta.read_params(path, fs) == {"kind": "probe", "n": 2}
    assert json.loads(fs.read_text(fs.join(path, "_params")))["n"] == 2
    # no temp turds left behind by the overwrite rename
    assert [e for e in fs.listdir(path) if e.startswith("_params.tmp")] == []


# -- object-store rename semantics (copy+delete), crash injectable ----------


class ObjectStoreFS(storemeta.LocalFS):
    """S3-shaped test double over ``fake://bucket/``: rename is a
    NON-ATOMIC recursive copy+delete (what s3a really does), and
    ``replace_text`` is a direct single-key overwrite PUT — the same
    branch :class:`HadoopFS` takes for ``OBJECT_STORE_SCHEMES``."""

    PREFIX = "fake://bucket/"
    atomic_rename = False

    def __init__(self, root: str):
        self.root = root
        self.fail_after: int | None = None  # crash injection knob

    def _local(self, path: str) -> str:
        assert path.startswith(self.PREFIX), f"scheme lost: {path!r}"
        return os.path.join(self.root, path[len(self.PREFIX):])

    def exists(self, path):
        return os.path.exists(self._local(path))

    def isdir(self, path):
        return os.path.isdir(self._local(path))

    def listdir(self, path):
        return os.listdir(self._local(path))

    def makedirs(self, path):
        os.makedirs(self._local(path), exist_ok=True)

    def rmtree(self, path):
        shutil.rmtree(self._local(path))

    def read_text(self, path):
        lp = self._local(path)
        if not os.path.exists(lp):
            return None
        with open(lp) as f:
            return f.read()

    def replace_text(self, path, text):
        with open(self._local(path), "w") as f:  # single-key PUT
            f.write(text)

    def rename(self, src, dst):
        """Copy-then-delete, object by object; crashes mid-way when
        ``fail_after`` is set (leaving a PARTIAL destination and the
        intact source — exactly an interrupted s3a 'rename')."""
        s, d = self._local(src), self._local(dst)
        copied = 0
        for dirpath, _dirnames, filenames in os.walk(s):
            rel = os.path.relpath(dirpath, s)
            target = d if rel == "." else os.path.join(d, rel)
            os.makedirs(target, exist_ok=True)
            for name in filenames:
                if self.fail_after is not None and copied >= self.fail_after:
                    raise OSError("injected crash mid copy+delete rename")
                shutil.copy(os.path.join(dirpath, name),
                            os.path.join(target, name))
                copied += 1
        shutil.rmtree(s)


def _seed_versioned(fs, path, tag):
    fs.makedirs(path + "/v=0")
    fs.replace_text(fs.join(path + "/v=0", "part-00000.parquet"), tag)
    storemeta.write_params(
        path, "test", {"k": 3, storemeta.VERSION_KEY: 0}, fs)


def _rewrite(fs, path, tag):
    tmp = path + ".__compact__"
    fs.makedirs(tmp)
    fs.replace_text(fs.join(tmp, "part-00000.parquet"), tag)
    storemeta.write_params(tmp, "test", {"k": 3}, fs)
    return tmp


def test_pointer_commit_survives_nonatomic_rename(tmp_path):
    fs = ObjectStoreFS(str(tmp_path))
    path = fs.PREFIX + "store"
    _seed_versioned(fs, path, "old")
    tmp = _rewrite(fs, path, "new")
    storemeta.commit_swap_versioned(path, tmp, fs)
    dp = storemeta.data_path(path, fs)
    assert dp == path + "/v=1"
    assert fs.read_text(fs.join(dp, "part-00000.parquet")) == "new"
    assert not fs.exists(path + "/v=0")


def test_pointer_commit_crash_mid_rename_never_tears_the_store(tmp_path):
    """The whole reason rename non-atomicity is safe in pointer mode:
    the copy+delete only ever targets an UNREFERENCED version dir. A
    crash mid-copy leaves the pointer at v=0 and a partial v=1 no
    reader resolves; recovery GCs it and the retry commits clean."""
    fs = ObjectStoreFS(str(tmp_path))
    path = fs.PREFIX + "store"
    _seed_versioned(fs, path, "old")
    tmp = _rewrite(fs, path, "new")
    fs.makedirs(tmp + "/extra")  # multi-object rename
    fs.replace_text(fs.join(tmp + "/extra", "part-00001.parquet"), "new2")
    fs.fail_after = 1
    with pytest.raises(OSError, match="injected crash"):
        storemeta.commit_swap_versioned(path, tmp, fs)
    fs.fail_after = None
    # pointer untouched, old data fully readable
    assert storemeta.data_path(path, fs) == path + "/v=0"
    assert fs.read_text(
        fs.join(path + "/v=0", "part-00000.parquet")) == "old"
    # recovery GCs the partial unreferenced version + stale rewrite
    assert storemeta.recover_swap_versioned(path, fs) == "cleaned"
    assert not fs.exists(path + "/v=1")
    # retry end-to-end
    tmp = _rewrite(fs, path, "new")
    storemeta.commit_swap_versioned(path, tmp, fs)
    assert fs.read_text(
        fs.join(storemeta.data_path(path, fs), "part-00000.parquet")
    ) == "new"


def test_object_store_schemes_pick_put_primitive(spark, viewfs):
    """HadoopFS binds the commit primitive off the scheme; viewfs is
    rename-atomic, the object-store set is not."""
    assert viewfs.atomic_rename
    assert "s3a" in OBJECT_STORE_SCHEMES and "gs" in OBJECT_STORE_SCHEMES
