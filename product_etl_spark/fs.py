"""Filesystem probes that work on ANY Hadoop-supported URI.

``os.path.exists`` silently answers False for s3://, hdfs://, abfs://
paths — an existence probe built on it makes "table present?" checks
degrade to "no" on remote storage, which turns MERGE upserts into
initial overwrites and resume anti-joins into full recomputes with no
error (the failure mode the incremental-dedup store probe fixed in
round 5; these helpers generalize that fix to every probe site).

Probes go through the Hadoop FileSystem API of the active session, so
they resolve whatever scheme the deployment configures. The rename-
swap PUBLISH path of the plain-parquet writers, by contrast, is
genuinely local-filesystem-only (os.rename atomicity); writers call
``require_local`` to fail loudly on a remote URI instead of corrupting
state — on remote object stores a transactional table format
(Delta/Iceberg MERGE) replaces those writers, as their docstrings
note.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

def _scheme(path: str) -> str:
    head, sep, _ = path.partition("://")
    return head if sep else ""


def fs_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists, resolved through Hadoop's FileSystem
    for the path's scheme (local, HDFS, s3a, ... — anything the
    session's Hadoop conf can load)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def table_exists(spark: SparkSession, path: str) -> bool:
    """True iff a COMMITTED parquet table lives at ``path`` — the
    job-commit marker ``_SUCCESS`` is probed, not the bare directory,
    so a half-written (crashed) output does not count as present."""
    return fs_exists(spark, path.rstrip("/") + "/_SUCCESS")


def require_local(path: str, op: str) -> None:
    """Raise for ANY URI scheme — including ``file://`` — before an
    os.rename-based publish can touch it. The publishers operate on
    the raw string with os.path/os.rename/shutil, which cannot
    resolve URIs (``os.path.exists('file:///x')`` is False even when
    /x exists), so a ``file://`` spelling would silently skip the
    backup branch and fail mid-swap; callers pass a plain local path
    instead. Loud-and-early beats the silent alternative: the rename
    would raise FileNotFoundError only AFTER the staging write burned
    a full pass over the data."""
    if _scheme(path):
        hint = (
            "pass a plain local path (no file:// prefix)"
            if _scheme(path) == "file"
            else "on remote storage use a transactional table format "
            "(Delta/Iceberg MERGE) instead"
        )
        raise ValueError(
            f"{op} publishes via local-filesystem rename and cannot target "
            f"{path!r}; {hint}"
        )
