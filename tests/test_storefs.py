"""Object-store seam: the pointer-mode store lifecycle parameterized
over the filesystem abstraction (operators/storemeta.py LocalFS), and
the spark.hadoop.* configuration passthrough (session.py).

The SchemeFS double serves ``mock://bucket/...`` URLs from a local
root: if any storemeta function bypassed the seam (direct ``os.*``)
or mangled the scheme (``os.path.normpath`` would collapse the
``//``), these tests fail with FileNotFoundError — which is exactly
how an s3a:// path would break. The sandbox has no object store;
this pins that only the FS implementation, never the store logic,
is filesystem-specific."""

from __future__ import annotations

import json
import os

import pytest

from distributed_computing_projects_spark import session
from distributed_computing_projects_spark.operators import storemeta


class SchemeFS(storemeta.LocalFS):
    """Test double: ``mock://bucket/<p>`` maps to ``<root>/<p>``."""

    PREFIX = "mock://bucket/"

    def __init__(self, root: str):
        self.root = root

    def _local(self, path: str) -> str:
        assert path.startswith(self.PREFIX), f"scheme lost: {path!r}"
        return os.path.join(self.root, path[len(self.PREFIX):])

    def exists(self, path):
        return super().exists(self._local(path))

    def isdir(self, path):
        return super().isdir(self._local(path))

    def listdir(self, path):
        return super().listdir(self._local(path))

    def rename(self, src, dst):
        super().rename(self._local(src), self._local(dst))

    def rmtree(self, path):
        super().rmtree(self._local(path))

    def makedirs(self, path):
        super().makedirs(self._local(path))

    def read_text(self, path):
        return super().read_text(self._local(path))

    def replace_text(self, path, text):
        super().replace_text(self._local(path), text)


def _mk(tmp_path, scheme: bool):
    """(fs, store_url): a rename-mode fake store with one data file."""
    if scheme:
        fs = SchemeFS(str(tmp_path))
        path = SchemeFS.PREFIX + "store"
    else:
        fs = storemeta.LOCAL
        path = str(tmp_path / "store")
    fs.makedirs(path)
    fs.replace_text(fs.join(path, "part-00000.parquet"), "old")
    storemeta.write_params(path, "test", {"k": 3}, fs)
    return fs, path


def _tag(fs, data_dir: str) -> str:
    return fs.read_text(fs.join(data_dir, "part-00000.parquet"))


@pytest.mark.parametrize("scheme", [False, True],
                         ids=["local-path", "mock-url"])
def test_pointer_lifecycle_over_fs(tmp_path, scheme):
    """convert -> commit -> crash-recover, through the seam only."""
    fs, path = _mk(tmp_path, scheme)

    v0 = storemeta.convert_to_versioned(path, fs)
    assert v0 == f"{path}/v=0"
    assert storemeta.data_path(path, fs) == v0
    assert _tag(fs, v0) == "old"
    assert storemeta.convert_to_versioned(path, fs) == v0  # idempotent

    # verified rewrite lands, pointer flips, superseded version GC'd
    tmp = path + ".__compact__"
    fs.makedirs(tmp)
    fs.replace_text(fs.join(tmp, "part-00000.parquet"), "new")
    storemeta.write_params(tmp, "test", {"k": 3}, fs)
    storemeta.commit_swap_versioned(path, tmp, fs)
    meta = storemeta.read_params(path, fs)
    assert meta[storemeta.VERSION_KEY] == 1 and meta["k"] == 3
    assert _tag(fs, storemeta.data_path(path, fs)) == "new"
    assert not fs.exists(f"{path}/v=0") and not fs.exists(tmp)

    # crash cut point: unreferenced v=2 landed, pointer still at 1
    fs.makedirs(f"{path}/v=2")
    fs.replace_text(fs.join(f"{path}/v=2", "part-00000.parquet"), "half")
    assert storemeta.recover_swap_versioned(path, fs) == "cleaned"
    assert _tag(fs, storemeta.data_path(path, fs)) == "new"
    assert storemeta.recover_swap_versioned(path, fs) == "noop"


@pytest.mark.parametrize("scheme", [False, True],
                         ids=["local-path", "mock-url"])
def test_sidecar_roundtrip_over_fs(tmp_path, scheme):
    fs, path = _mk(tmp_path, scheme)
    assert storemeta.read_params(path, fs) == {"kind": "test", "k": 3}
    assert storemeta.read_params(path + "-missing", fs) is None


def test_scheme_paths_never_hit_os_path_semantics(tmp_path):
    """fs.join is plain '/' concatenation — the double slash of a URL
    scheme survives (os.path.normpath would collapse it)."""
    fs = SchemeFS(str(tmp_path))
    joined = fs.join("mock://bucket/store/", "v=1")
    assert joined == "mock://bucket/store/v=1"


def test_hadoop_conf_from_env(tmp_path, monkeypatch):
    conf = tmp_path / "obj.properties"
    conf.write_text(
        "# endpoint for the test fixture\n"
        "fs.s3a.endpoint=https://minio.local:9000\n"
        "fs.s3a.path.style.access=true\n"
        "spark.hadoop.fs.s3a.connection.maximum=64\n"
        "\n"
        "malformed line without equals\n"
    )
    monkeypatch.setenv("SPARK_GRAFT_HADOOP_CONF", str(conf))
    got = session.hadoop_conf_from_env()
    assert got == {
        "spark.hadoop.fs.s3a.endpoint": "https://minio.local:9000",
        "spark.hadoop.fs.s3a.path.style.access": "true",
        "spark.hadoop.fs.s3a.connection.maximum": "64",
    }
    monkeypatch.delenv("SPARK_GRAFT_HADOOP_CONF")
    assert session.hadoop_conf_from_env() == {}


def test_hadoop_conf_missing_file_is_empty(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_HADOOP_CONF", "/nonexistent/x.props")
    assert session.hadoop_conf_from_env() == {}
