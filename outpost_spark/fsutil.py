"""Filesystem helper for maintenance ops (retention, compaction, index).

Maintenance rewrites (drop partition, compact, crash-safe staged swap)
need directory listing / rename / delete — operations Spark's DataFrame
API deliberately doesn't expose.  Routing them through Hadoop's
``FileSystem`` API (via the session JVM) makes every maintenance op work
on any warehouse scheme Spark itself can read: plain local paths,
``file://``, ``hdfs://``, ``s3a://``, ``abfss://``, ...

Atomicity note: the staged-swap protocol (``_tmp_*`` write ->
``_trash_*`` rename) is atomic on local filesystems and HDFS.  Object
stores (s3a) emulate rename by copy+delete; the swap journal written by
``retention._swap_partition`` (file-size manifests of both sides) makes
every mid-swap crash window — including partial copies — recovery-
tested (tests/test_retention_sources_sinkfns.py's ``test_swap_crash_*``
construct each window and assert convergence).  A table format
(Delta/Iceberg) remains the standard answer at that layer; this module
keeps plain-parquet maintenance safe everywhere.

When no SparkSession is active (pure-unit contexts) a local ``os``
fallback handles schemeless paths, so helpers remain callable without a
JVM.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


class MaintenanceFS:
    """Thin wrapper over ``org.apache.hadoop.fs.FileSystem`` for one root.

    All child paths are joined JVM-side (``Path(parent, child)``), so URI
    schemes and authorities survive.
    """

    def __init__(self, spark: SparkSession, root: str):
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self.root = self._Path(root)
        self.fs = self.root.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )

    def _p(self, *parts: str):
        p = self.root
        for part in parts:
            p = self._Path(p, part)
        return p

    def exists(self, *parts: str) -> bool:
        return self.fs.exists(self._p(*parts))

    def is_dir(self, *parts: str) -> bool:
        p = self._p(*parts)
        return self.fs.exists(p) and self.fs.getFileStatus(p).isDirectory()

    def listdir(self, *parts: str) -> list[str]:
        """Child names (not paths) of a directory; [] if absent."""
        p = self._p(*parts)
        if not self.fs.exists(p):
            return []
        return sorted(s.getPath().getName() for s in self.fs.listStatus(p))

    def list_files(self, *parts: str) -> list[str]:
        p = self._p(*parts)
        if not self.fs.exists(p):
            return []
        return sorted(
            s.getPath().getName() for s in self.fs.listStatus(p) if s.isFile()
        )

    def rename(self, src_parts: list[str], dst_parts: list[str]) -> None:
        ok = self.fs.rename(self._p(*src_parts), self._p(*dst_parts))
        if not ok:
            raise OSError(
                f"rename failed: {self._p(*src_parts)} -> {self._p(*dst_parts)}"
            )

    def delete(self, *parts: str) -> None:
        # Hadoop's delete reports failure via its boolean, not an
        # exception (RawLocalFileSystem returns false on e.g. permission
        # errors) — swallowing it would let retention report rows as
        # deleted while the partition is still on disk and discoverable
        p = self._p(*parts)
        if not self.fs.delete(p, True) and self.fs.exists(p):
            raise OSError(f"delete failed: {p}")

    def path_str(self, *parts: str) -> str:
        return self._p(*parts).toString()

    def file_sizes(self, *parts: str) -> dict[str, int]:
        """{file name: byte length} for a directory's immediate files."""
        p = self._p(*parts)
        if not self.fs.exists(p):
            return {}
        return {
            s.getPath().getName(): s.getLen()
            for s in self.fs.listStatus(p)
            if s.isFile()
        }

    def write_text(self, parts: list[str], text: str) -> None:
        """Create-or-overwrite a small text file (swap journals)."""
        out = self.fs.create(self._p(*parts), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def read_text(self, *parts: str) -> str:
        stream = self.fs.open(self._p(*parts))
        try:
            # readAllBytes avoids a py4j round-trip per read() chunk
            data = bytes(stream.readAllBytes())
        finally:
            stream.close()
        return data.decode("utf-8")


class _LocalFS:
    """``os``-based fallback with the same surface, for JVM-less contexts."""

    def __init__(self, root: str):
        if "://" in root:
            raise NotImplementedError(
                f"path {root!r} has a URI scheme but no SparkSession is active "
                "to reach the Hadoop FileSystem API — start a session first"
            )
        self.root = root

    def _p(self, *parts: str) -> str:
        return os.path.join(self.root, *parts)

    def exists(self, *parts: str) -> bool:
        return os.path.exists(self._p(*parts))

    def is_dir(self, *parts: str) -> bool:
        return os.path.isdir(self._p(*parts))

    def listdir(self, *parts: str) -> list[str]:
        p = self._p(*parts)
        return sorted(os.listdir(p)) if os.path.isdir(p) else []

    def list_files(self, *parts: str) -> list[str]:
        p = self._p(*parts)
        if not os.path.isdir(p):
            return []
        return sorted(
            f for f in os.listdir(p) if os.path.isfile(os.path.join(p, f))
        )

    def rename(self, src_parts: list[str], dst_parts: list[str]) -> None:
        os.rename(self._p(*src_parts), self._p(*dst_parts))

    def delete(self, *parts: str) -> None:
        p = self._p(*parts)
        if os.path.isdir(p):
            shutil.rmtree(p)
        elif os.path.exists(p):
            os.remove(p)

    def path_str(self, *parts: str) -> str:
        return self._p(*parts)

    def file_sizes(self, *parts: str) -> dict[str, int]:
        p = self._p(*parts)
        if not os.path.isdir(p):
            return {}
        return {
            f: os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if os.path.isfile(os.path.join(p, f))
        }

    def write_text(self, parts: list[str], text: str) -> None:
        with open(self._p(*parts), "w", encoding="utf-8") as fh:
            fh.write(text)

    def read_text(self, *parts: str) -> str:
        with open(self._p(*parts), encoding="utf-8") as fh:
            return fh.read()


def maintenance_fs(root: str, spark: SparkSession | None = None):
    """Resolve the right filesystem wrapper for ``root``.

    Prefers the Hadoop API whenever a session is available (covering every
    scheme the cluster supports); falls back to local ``os`` only when no
    JVM exists and the path is schemeless.
    """
    spark = spark or SparkSession.getActiveSession()
    if spark is not None:
        return MaintenanceFS(spark, root)
    return _LocalFS(root)
