"""Snapshot isolation / time travel on plain parquet."""

from __future__ import annotations

import pytest

from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs.snapshots import (
    commit_snapshot,
    read_snapshot,
    rollback_snapshot,
    table_versions,
    vacuum_snapshots,
    _manifest_path,
    _write_json_atomic,
)


def _rows(spark, *vals):
    return spark.createDataFrame([(v,) for v in vals], "x long")


def test_append_overwrite_time_travel_rollback(spark, tmp_path):
    root = str(tmp_path / "snap")
    v1 = commit_snapshot(spark, _rows(spark, 1, 2), root)
    v2 = commit_snapshot(spark, _rows(spark, 3), root, mode="append")
    v3 = commit_snapshot(spark, _rows(spark, 9), root, mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert table_versions(spark, root) == [1, 2, 3]

    # latest = overwrite; older versions stay consistent (time travel)
    assert {r.x for r in read_snapshot(spark, root).collect()} == {9}
    assert {r.x for r in read_snapshot(spark, root, 2).collect()} == {1, 2, 3}
    assert {r.x for r in read_snapshot(spark, root, 1).collect()} == {1, 2}

    # rollback preserves history as a new version
    v4 = rollback_snapshot(spark, root, 2)
    assert v4 == 4
    assert {r.x for r in read_snapshot(spark, root).collect()} == {1, 2, 3}
    assert {r.x for r in read_snapshot(spark, root, 3).collect()} == {9}


def test_commit_cas_retries_on_conflict(spark, tmp_path):
    """A writer losing the version race must rebase onto the winner's
    snapshot and land on the next version — simulated by pre-writing
    the manifest the writer will try first."""
    root = str(tmp_path / "snap_cas")
    commit_snapshot(spark, _rows(spark, 1), root)
    # squat on v2 referencing v1's segments (a 'concurrent' append)
    import json

    from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs.snapshots import (
        _read_json,
    )

    cur = _read_json(spark, _manifest_path(root, 1))
    squat = {
        "version": 2,
        "mode": "append",
        "parent": 1,
        "segments": cur["segments"],
    }
    assert _write_json_atomic(spark, _manifest_path(root, 2), squat)
    # this commit tries v2, loses, rebases (append includes the
    # squatter's list = v1 segments), lands on v3
    v = commit_snapshot(spark, _rows(spark, 7), root, mode="append")
    assert v == 3
    assert {r.x for r in read_snapshot(spark, root).collect()} == {1, 7}


def test_vacuum_expires_and_deletes_orphans(spark, tmp_path):
    import os

    root = str(tmp_path / "snap_vac")
    commit_snapshot(spark, _rows(spark, 1), root)
    commit_snapshot(spark, _rows(spark, 2), root, mode="overwrite")
    commit_snapshot(spark, _rows(spark, 3), root, mode="append")
    assert len(os.listdir(f"{root}/data")) == 3

    # default grace period protects fresh segments (in-flight commit
    # window): nothing is deleted...
    assert vacuum_snapshots(spark, root, keep_last=3) == (0, 0)
    n_man, n_seg = vacuum_snapshots(
        spark, root, keep_last=1, min_segment_age_seconds=0
    )
    assert (n_man, n_seg) == (2, 1)  # v1,v2 expired; v1's segment orphaned
    assert table_versions(spark, root) == [3]
    assert len(os.listdir(f"{root}/data")) == 2
    assert {r.x for r in read_snapshot(spark, root).collect()} == {2, 3}
    # expired versions are gone
    with pytest.raises(Exception):
        read_snapshot(spark, root, 1)
    # idempotent
    assert vacuum_snapshots(
        spark, root, keep_last=1, min_segment_age_seconds=0
    ) == (0, 0)


def test_read_empty_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, str(tmp_path / "nope"))


def test_vacuum_grace_protects_inflight_segments(spark, tmp_path):
    """An unreferenced segment younger than the grace period must
    survive vacuum — it may belong to a commit that has staged data
    but not yet won the manifest CAS."""
    import os

    root = str(tmp_path / "snap_grace")
    commit_snapshot(spark, _rows(spark, 1), root)
    commit_snapshot(spark, _rows(spark, 2), root, mode="overwrite")
    # simulate an in-flight writer: a staged segment, no manifest yet
    _rows(spark, 99).write.parquet(f"{root}/data/s-inflight")
    n_man, n_seg = vacuum_snapshots(spark, root, keep_last=1)
    assert n_man == 1 and n_seg == 0  # manifests expire, segments survive
    assert sorted(os.listdir(f"{root}/data")).__len__() == 3
