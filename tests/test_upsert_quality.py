"""MERGE/upsert emulation + data-quality checks."""

from __future__ import annotations

from bootcamp_stackacademy_datalake_minio_airflow_spark.functions.quality import (
    duplicate_keys,
    null_profile,
    out_of_range,
)
from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs.upsert import (
    merge_upsert,
    upsert_parquet,
)


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    out = {r.k: (r.s, r.v) for r in merge_upsert(target, updates, "k").collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_tombstones(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    updates = spark.createDataFrame(
        [(1, "A", False), (2, None, True)], "k long, s string, deleted boolean"
    )
    out = {r.k: r.s for r in merge_upsert(target, updates, "k", "deleted").collect()}
    assert out == {1: "A"}  # 2 tombstoned


def test_upsert_parquet_partition_pruned(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "2024-01", 1.0), (2, "2024-01", 2.0), (3, "2024-02", 3.0)],
        "k long, mes string, v double",
    ).write.partitionBy("mes").parquet(path)

    updates = spark.createDataFrame([(2, "2024-01", 99.0)], "k long, mes string, v double")
    upsert_parquet(spark, path, updates, "k", partition_col="mes")
    out = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert out == {1: 1.0, 2: 99.0, 3: 3.0}  # 2024-02 partition untouched


def test_upsert_parquet_escaped_partition_tombstone(spark, tmp_path):
    """Fully-tombstoned partitions whose values Hive percent-escapes
    (here ':' -> '%3A') must still be deleted — raw string matching of
    directory names would silently keep them."""
    path = str(tmp_path / "t_esc")
    spark.createDataFrame(
        [(1, "a:b", 1.0), (2, "a:b", 2.0), (3, "plain", 3.0)],
        "k long, part string, v double",
    ).write.partitionBy("part").parquet(path)

    updates = spark.createDataFrame(
        [(1, "a:b", 0.0, True), (2, "a:b", 0.0, True)],
        "k long, part string, v double, deleted boolean",
    )
    upsert_parquet(
        spark, path, updates, "k", partition_col="part", tombstone_col="deleted"
    )
    out = {r.k: r.part for r in spark.read.parquet(path).collect()}
    assert out == {3: "plain"}, "tombstoned escaped partition must not resurface"


def test_upsert_parquet_recovers_crashed_swap(spark, tmp_path):
    """If a prior run died between publish_swap's two renames (live
    partition dir moved to the backup root, staging never renamed in),
    a re-run must restore the backup BEFORE reading the target — else
    it merges against an empty partition and silently drops every
    non-updated row."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.fsutil import _fs_for, _jp

    path = str(tmp_path / "t_crash")
    spark.createDataFrame(
        [(1, "2024-01", 1.0), (2, "2024-01", 2.0), (3, "2024-02", 3.0)],
        "k long, mes string, v double",
    ).write.partitionBy("mes").parquet(path)

    # simulate the crash window: mes=2024-01 parked in the backup root
    fs, jvm = _fs_for(spark, path)
    backup_root = f"{path}__backup"
    fs.mkdirs(_jp(jvm, backup_root))
    assert fs.rename(
        _jp(jvm, f"{path}/mes=2024-01"), _jp(jvm, f"{backup_root}/mes=2024-01")
    )

    updates = spark.createDataFrame(
        [(2, "2024-01", 99.0)], "k long, mes string, v double"
    )
    upsert_parquet(spark, path, updates, "k", partition_col="mes")
    out = {r.k: r.v for r in spark.read.parquet(path).collect()}
    # k=1 survives ONLY if recovery ran before the target read
    assert out == {1: 1.0, 2: 99.0, 3: 3.0}
    assert not fs.exists(_jp(jvm, backup_root))


def test_upsert_parquet_empty_string_partition(spark, tmp_path):
    """'' and NULL both write to __HIVE_DEFAULT_PARTITION__ and BOTH
    read back as NULL; an update carrying '' must still pull the whole
    default partition into the merge — isin(['']) alone matches
    nothing, so the merge would run against an empty target and the
    swap would drop every non-updated default-partition row."""
    path = str(tmp_path / "t_empty")
    spark.createDataFrame(
        [(1, "", 1.0), (2, "", 2.0), (3, "real", 3.0)],
        "k long, part string, v double",
    ).write.partitionBy("part").parquet(path)

    updates = spark.createDataFrame(
        [(2, "", 99.0)], "k long, part string, v double"
    )
    upsert_parquet(spark, path, updates, "k", partition_col="part")
    out = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert out == {1: 1.0, 2: 99.0, 3: 3.0}, (
        "non-updated default-partition rows must survive an "
        "empty-string-partition upsert"
    )


def test_upsert_parquet_boolean_partition_tombstone(spark, tmp_path):
    """Spark writes boolean partitions lowercase ('flag=true');
    Python's str(True)='True' would never match the directory, so a
    fully-tombstoned boolean partition would escape deletion."""
    path = str(tmp_path / "t_bool")
    spark.createDataFrame(
        [(1, True, 1.0), (2, True, 2.0), (3, False, 3.0)],
        "k long, flag boolean, v double",
    ).write.partitionBy("flag").parquet(path)

    updates = spark.createDataFrame(
        [(1, True, 0.0, True), (2, True, 0.0, True)],
        "k long, flag boolean, v double, deleted boolean",
    )
    upsert_parquet(
        spark, path, updates, "k", partition_col="flag", tombstone_col="deleted"
    )
    # partition-type inference may return the column as string 'false'
    out = {r.k: str(r.flag).lower() for r in spark.read.parquet(path).collect()}
    assert out == {3: "false"}, "tombstoned boolean partition must not resurface"


def test_null_profile_and_range(spark):
    df = spark.createDataFrame([(1, None), (2, 5.0), (None, 200.0)], "k long, v double")
    prof = null_profile(df).first()
    assert prof.k == 1 and prof.v == 1
    bad = out_of_range(df, "v", 0.0, 100.0).collect()
    assert len(bad) == 1 and bad[0].v == 200.0


def test_duplicate_keys(spark):
    df = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], "k long, s string")
    dups = duplicate_keys(df, ["k"]).collect()
    assert len(dups) == 1 and dups[0].k == 1 and dups[0].n == 2
