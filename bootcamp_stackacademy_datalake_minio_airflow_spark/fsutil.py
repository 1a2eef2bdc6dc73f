"""Stage-then-swap publish primitives over the Hadoop FileSystem API.

Plain-parquet maintenance ops (compaction, MERGE rewrite) must never
overwrite a live prefix in the same job that reads it: a mid-write
failure would leave the table half-rewritten. The safe lifecycle is

    write to a __staging sibling -> validate -> rename over the target

Rename is atomic on HDFS and posix filesystems; on S3A it degrades to
copy+delete, where this pattern still minimizes the exposure window to
the two renames (and the staging write itself uses the committer
configured in session.py). The previous generation of the data is kept
as ``<path>__replaced`` until the swap completes, so a failure between
the renames is recoverable by hand (and rolled back automatically when
the second rename fails).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_for(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _jp(jvm, path: str):
    return jvm.org.apache.hadoop.fs.Path(path)


def publish_swap(
    spark: SparkSession,
    staging_path: str,
    final_path: str,
    backup_path: str | None = None,
) -> None:
    """Publish ``staging_path`` over ``final_path`` via two renames,
    rolling back to the previous generation if the second fails.

    ``backup_path`` overrides where the previous generation is parked
    during the swap. REQUIRED when ``final_path`` is a partition
    directory inside a live table root: the default
    ``<final>__replaced`` sibling would sit inside the table, where
    partition discovery reads it as a bogus partition value (e.g.
    ``dt=2024-01-01__replaced``) during the swap — and permanently if
    the job dies between the renames. Point it outside the root
    instead.
    """
    fs, jvm = _fs_for(spark, final_path)
    final, staging = _jp(jvm, final_path), _jp(jvm, staging_path)
    old = _jp(jvm, (backup_path or final_path.rstrip("/") + "__replaced"))
    if backup_path is not None:
        fs.mkdirs(old.getParent())
    # Crash recovery BEFORE cleanup: if a previous run died between
    # its two renames, the backup dir holds the ONLY copy of the table
    # (final is gone). Restore it first — deleting a leftover backup
    # unconditionally would destroy that sole surviving generation.
    if fs.exists(old):
        if not fs.exists(final):
            if not fs.rename(old, final):
                raise IOError(
                    f"publish_swap: orphaned previous generation at {old} "
                    f"with no live {final_path}, and restoring it failed; "
                    "resolve manually before publishing"
                )
        else:
            fs.delete(old, True)
    had_previous = fs.exists(final)
    if had_previous and not fs.rename(final, old):
        raise IOError(f"publish_swap: cannot move {final_path} aside")
    if not fs.rename(staging, final):
        if had_previous and not fs.rename(old, final):  # roll back
            raise IOError(
                f"publish_swap: publish of {staging_path} failed AND the "
                f"rollback rename failed — {final_path} is missing; the "
                f"previous generation is stranded at {old}"
            )
        raise IOError(f"publish_swap: cannot publish {staging_path}")
    if had_previous:
        fs.delete(old, True)


def recover_swaps(
    spark: SparkSession, final_path: str, backup_path: str | None = None
) -> None:
    """Restore leftover previous generations from a crashed publish_swap.

    MUST run before a job READS ``final_path`` to compute a rewrite it
    will then publish: if a prior run died between publish_swap's two
    renames, the backup dir holds the ONLY copy of the data and the
    final path is empty — reading first would compute the rewrite
    against nothing, and the publish itself would then restore the
    backup only to overwrite it (and delete the backup root),
    silently losing every non-rewritten row.

    Covers both layouts: the flat ``<final>__replaced`` sibling used
    by un-partitioned swaps, and a per-partition ``backup_path`` root
    (one subdir per partition dir, as upsert_parquet stages them).
    For each leftover: if the live path survived, the backup is a
    stale previous generation — delete it; if not, the backup is the
    sole copy — rename it back, or fail loudly.
    """
    fs, jvm = _fs_for(spark, final_path)
    pairs = []
    legacy = _jp(jvm, final_path.rstrip("/") + "__replaced")
    if fs.exists(legacy):
        pairs.append((legacy, _jp(jvm, final_path)))
    if backup_path is not None:
        broot = _jp(jvm, backup_path)
        if fs.exists(broot):
            for st in fs.listStatus(broot):
                name = st.getPath().getName()
                pairs.append(
                    (st.getPath(), _jp(jvm, f"{final_path.rstrip('/')}/{name}"))
                )
    for old, final in pairs:
        if fs.exists(final):
            fs.delete(old, True)
        elif not fs.rename(old, final):
            raise IOError(
                f"recover_swaps: orphaned previous generation at {old} with "
                f"no live {final}, and restoring it failed; resolve manually"
            )
    if backup_path is not None and fs.exists(_jp(jvm, backup_path)):
        fs.delete(_jp(jvm, backup_path), True)


def list_subdirs(spark: SparkSession, path: str) -> list[str]:
    """Names of immediate subdirectories (e.g. partition dirs like
    ``dt=2024-01-01``) of a path."""
    fs, jvm = _fs_for(spark, path)
    return [
        st.getPath().getName()
        for st in fs.listStatus(_jp(jvm, path))
        if st.isDirectory()
    ]


def delete_path(spark: SparkSession, path: str) -> None:
    fs, jvm = _fs_for(spark, path)
    fs.delete(_jp(jvm, path), True)
