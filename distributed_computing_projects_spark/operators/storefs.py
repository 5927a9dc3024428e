"""Hadoop-backed filesystem for the store-commit seam.

``operators/storemeta.py`` routes every sidecar / pointer-commit IO
through an FS object (``LocalFS``). This module supplies the
implementation that targets a REAL Hadoop filesystem through the
driver's JVM (py4j) — any scheme the session's hadoop conf enables:
``hdfs://``, ``viewfs://``, ``s3a://``, ``gs://``, ``abfs://``. Spark
itself already reads/writes the store's parquet through the same conf
(``session.hadoop_conf_from_env``); this closes the gap for the
Python-side sidecar and pointer-flip operations, so the whole
pointer-mode store lifecycle (epoch append -> compact rewrite ->
commit -> probe) runs against one non-``file://`` filesystem
end-to-end. The test suite drives it through a ``viewfs://`` mount
(client-side mount table over ``file://`` — the one non-local scheme
a hermetic container can serve), plus an object-store-semantics shim
whose rename is copy+delete.

Commit primitive per backend — the part that is genuinely
filesystem-specific:

- **rename-atomic filesystems** (HDFS, viewfs-over-HDFS, local):
  ``replace_text`` writes a temp object and renames over the
  destination with ``FileContext.rename(..., Options.Rename.
  OVERWRITE)`` — a single atomic metadata operation; readers see the
  old sidecar or the new one, never a torn or missing one.
- **object stores** (``s3a``/``gs``/``abfs``/``oss``/``cos``/
  ``wasb``): rename is a NON-ATOMIC copy+delete, so it is never used
  as the commit instant. ``replace_text`` instead PUTs the sidecar
  object directly (``FileSystem.create(path, overwrite=true)``) —
  a single-key overwrite, which object stores make atomic
  (read-after-write consistent on S3 since 2020; generation-match /
  conditional PUT hardens it further where offered). Directory
  renames in :func:`storemeta.commit_swap_versioned` only ever move
  an UNREFERENCED version directory, so their non-atomicity on an
  object store is harmless: a crash mid-copy leaves garbage no
  reader resolves — ``recover_swap_versioned`` GCs it. The
  rename-mode backend (``storemeta.commit_swap``), whose correctness
  DOES hinge on atomic directory rename, must not be used on these
  schemes — convert the store with
  :func:`storemeta.convert_to_versioned` first.

Reference parity note: the reference pins files to its own SDFS
(mp3/src/sdfs.go); delegating the byte layer to HDFS/S3 behind
Spark's hadoop conf is the BASELINE.json-documented replacement.
"""

from __future__ import annotations

from distributed_computing_projects_spark.operators.storemeta import LocalFS

# schemes whose rename is copy+delete (never a commit primitive)
OBJECT_STORE_SCHEMES = frozenset(
    {"s3a", "s3n", "s3", "gs", "abfs", "abfss", "wasb", "wasbs", "oss",
     "cos", "swift"}
)


class HadoopFS(LocalFS):
    """``LocalFS`` surface over a JVM ``org.apache.hadoop.fs
    .FileSystem`` — one instance per (session, scheme+authority).
    Paths are full URLs (``viewfs://cluster/data/store``); ``join``
    stays plain ``/`` concatenation from the base class, so schemes
    survive unmangled."""

    def __init__(self, spark, uri: str):
        sc = spark.sparkContext
        self._jvm = sc._jvm
        self._gw = sc._gateway
        conf = sc._jsc.hadoopConfiguration()
        juri = self._jvm.java.net.URI(uri)
        # newInstance, not get: the JVM-wide FileSystem cache is keyed
        # by (scheme, authority) only, so a cached instance would keep
        # resolving with the conf it FIRST saw (e.g. a viewfs mount
        # table edited after first use) while FileContext re-resolves
        # — a split-brain this class must never have
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.newInstance(
            juri, conf)
        self._fc = self._jvm.org.apache.hadoop.fs.FileContext \
            .getFileContext(juri, conf)
        self.scheme = self._fs.getUri().getScheme()
        self.atomic_rename = self.scheme not in OBJECT_STORE_SCHEMES

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def isdir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p)
                    and self._fs.getFileStatus(p).isDirectory())

    def listdir(self, path: str) -> list[str]:
        return [st.getPath().getName()
                for st in self._fs.listStatus(self._p(path))]

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._p(src), self._p(dst)):
            raise OSError(f"hadoop rename failed: {src!r} -> {dst!r}")

    def rmtree(self, path: str) -> None:
        self._fs.delete(self._p(path), True)

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def read_text(self, path: str) -> str | None:
        p = self._p(path)
        if not self._fs.exists(p):
            return None
        stream = self._fs.open(p)
        try:
            return bytes(stream.readAllBytes()).decode("utf-8")
        finally:
            stream.close()

    def _put(self, path: str, text: str) -> None:
        out = self._fs.create(self._p(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def replace_text(self, path: str, text: str) -> None:
        """Atomic sidecar replace — see the module doc for why the
        primitive differs per backend."""
        if not self.atomic_rename:
            self._put(path, text)  # single-key PUT: the object-store
            return  # commit primitive (conditional where offered)
        tmp = f"{path}.tmp-{self._jvm.java.util.UUID.randomUUID().toString()}"
        self._put(tmp, text)
        overwrite = self._gw.new_array(
            self._jvm.org.apache.hadoop.fs.Options.Rename, 1)
        overwrite[0] = self._jvm.org.apache.hadoop.fs.Options \
            .Rename.OVERWRITE
        self._fc.rename(self._p(tmp), self._p(path), overwrite)
