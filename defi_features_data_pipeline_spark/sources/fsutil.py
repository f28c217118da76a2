"""Storage helpers routed through the Hadoop FileSystem API.

Sink/catalog code must not touch ``os.path`` / ``shutil``: those only
see the driver's local disk, so on HDFS/S3A an existence check would
silently report "no target", a watermark would read as None, and a
re-run would re-append the full source (breaking the incremental
idempotency contract). The Hadoop ``FileSystem`` resolves the scheme
from the path itself (``file://``, ``hdfs://``, ``s3a://``), so call
sites keep working unchanged when a local base dir becomes an
object-store prefix.

Caveat (KNOWN_LIMITS.md §5): directory rename is atomic on local/HDFS
but a non-atomic server-side copy on S3; the transactional upgrade
path at scale is a lakehouse table format (Delta/Iceberg MERGE +
snapshot commit), which replaces the swap entirely.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def has_committed_data(spark: SparkSession, path: str) -> bool:
    """True if ``path`` holds a committed write (_SUCCESS marker or
    parquet part files)."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return False
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.endswith(".parquet") or name == "_SUCCESS":
            return True
    return False


def swap_dirs(spark: SparkSession, tmp_path: str, final_path: str) -> None:
    """Promote ``tmp_path`` to ``final_path``: current target moves
    aside, tmp renames in, the old copy is dropped. Each rename is
    atomic on local/HDFS, so readers never observe a HALF-written
    directory — but there is a brief window between moving the old
    target aside and promoting tmp in which the target path is ABSENT.
    A failed promote rolls the old target back; a crash inside the
    window is repaired by the next call (the recovery step below).
    True no-window atomicity needs a table-format snapshot commit
    (Delta/Iceberg — KNOWN_LIMITS.md §5)."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs, final_p = _fs(spark, final_path)
    tmp_p = jvm_path(tmp_path)
    old_p = jvm_path(final_path.rstrip("/") + ".__swap_old__")
    # recover from a prior crash mid-swap: the old copy is the only
    # surviving data — restore it before (re)swapping
    if fs.exists(old_p) and not fs.exists(final_p):
        fs.rename(old_p, final_p)
    fs.delete(old_p, True)
    moved_aside = False
    if fs.exists(final_p):
        if not fs.rename(final_p, old_p):
            raise IOError(f"could not move {final_path} aside for swap")
        moved_aside = True
    try:
        if not fs.rename(tmp_p, final_p):
            raise IOError(f"could not promote {tmp_path} to {final_path}")
    except BaseException:
        if moved_aside:
            fs.rename(old_p, final_p)  # roll back so the target reappears
        raise
    fs.delete(old_p, True)


def list_parquet_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """Recursive (path, size_bytes) listing of parquet part files.
    A missing directory is an empty listing, not an error — so e.g.
    compacting a not-yet-written table is a no-op."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return []
    out: list[tuple[str, int]] = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            out.append((st.getPath().toString(), st.getLen()))
    return out
