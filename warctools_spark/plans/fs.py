"""Hadoop FileSystem seam for catalog / index sidecar I/O.

Everything the catalog does to its root — manifests, expiry sweeps,
sidecar JSON — goes through the JVM's `org.apache.hadoop.fs.FileSystem`
resolved FROM THE PATH, the same API `sources/warc.py::expand_files`
already uses for inputs. That makes `Catalog(root="s3a://bucket/crawl")`
and `build_ivf_index(path="s3a://...")` the SAME code path as the local
stand-in (verified in tests with a `file://` root): a real 100 TB crawl
catalog lives on an object store, not the driver's local disk.

Atomicity note: `write_text_atomic` is write-temp + rename. On HDFS and
local file:// that rename is atomic; on S3-class stores it is
copy+delete — the same caveat Iceberg's file-IO documents, acceptable
here because the manifest protocol tolerates a torn *temp* file (the
previous manifest stays the latest consistent snapshot) and never a
torn final one.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _require_spark(spark: SparkSession | None) -> SparkSession:
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "catalog filesystem access needs a SparkSession (none active)"
        )
    return spark


class HadoopFS:
    """Thin py4j wrapper over org.apache.hadoop.fs.FileSystem for one
    scheme+authority (resolved from the root path)."""

    def __init__(self, spark: SparkSession | None, root: str):
        spark = _require_spark(spark)
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._path(root).getFileSystem(self._conf)

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    # ---- queries ----
    def exists(self, p: str) -> bool:
        return self._fs.exists(self._path(p))

    def is_dir(self, p: str) -> bool:
        return self._fs.getFileStatus(self._path(p)).isDirectory()

    def listdir(self, p: str) -> list[str]:
        """Child names (not full paths) of a directory; [] if absent."""
        hp = self._path(p)
        if not self._fs.exists(hp):
            return []
        return sorted(
            st.getPath().getName() for st in self._fs.listStatus(hp)
        )

    def listdir_dirs(self, p: str) -> list[str]:
        hp = self._path(p)
        if not self._fs.exists(hp):
            return []
        return sorted(
            st.getPath().getName()
            for st in self._fs.listStatus(hp)
            if st.isDirectory()
        )

    # ---- mutations ----
    def mkdirs(self, p: str) -> None:
        self._fs.mkdirs(self._path(p))

    def delete(self, p: str, recursive: bool = True) -> bool:
        return self._fs.delete(self._path(p), recursive)

    def rename_over(self, src: str, dst: str) -> None:
        """Rename src -> dst, replacing dst if present (HDFS rename
        does not overwrite, unlike os.replace)."""
        hdst = self._path(dst)
        if self._fs.exists(hdst):
            self._fs.delete(hdst, False)
        if not self._fs.rename(self._path(src), hdst):
            raise IOError(f"rename failed: {src} -> {dst}")

    # ---- whole-file text ----
    def read_text(self, p: str) -> str:
        stream = self._fs.open(self._path(p))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def write_text(self, p: str, text: str) -> None:
        out = self._fs.create(self._path(p), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def write_text_atomic(self, p: str, text: str) -> None:
        tmp = p + ".tmp"
        self.write_text(tmp, text)
        self.rename_over(tmp, p)
