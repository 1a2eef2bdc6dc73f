"""MERGE/upsert emulation for plain-parquet lake tables.

Plain parquet has no transactional MERGE (that's Delta/Iceberg
territory); the lake-engine equivalent rewrites the target from a
full-outer join of target x updates:

    matched  -> take the update's values  (WHEN MATCHED THEN UPDATE)
    new      -> insert the update row     (WHEN NOT MATCHED THEN INSERT)
    deletes  -> optional anti-filter      (WHEN MATCHED AND tombstone)

The rewrite is partition-prunable: with ``partition_col``, only
partitions present in the updates are rewritten (classic
overwrite-by-partition), so a day's upsert touches a day's files, not
the whole table — the property that keeps MERGE viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Characters Spark/Hive percent-escape in partition directory values
# (ExternalCatalogUtils.escapePathName): ASCII control chars plus the
# path/URI-special set. Space is NOT escaped. Verified empirically
# against Spark 4's partitioned writes ("a b" -> "p=a b",
# "x:y" -> "p=x%3Ay", "p/q" -> "p=p%2Fq", "c%d" -> "p=c%25d").
_HIVE_ESCAPED = {chr(c) for c in range(0x01, 0x20)} | set('"#%\'*/:=?\\{[]^') | {
    chr(0x7F)
}
_HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def _hive_partition_dir(col: str, value) -> str:
    """The directory name Spark writes for a partition value — NULL and
    empty become the default-partition sentinel, special characters are
    percent-escaped. Matching raw ``str(value)`` against directory
    names misses any escaped value (and NULL), so tombstone-emptied
    partitions would silently survive."""
    if value is None or str(value) == "":
        return f"{col}={_HIVE_DEFAULT_PARTITION}"
    # Spark renders booleans lowercase ("p=true"), not Python's
    # str(True)="True" — without this, fully-tombstoned boolean
    # partitions escape deletion. Dates/decimals/ints/floats all
    # str() identically to Spark's rendering.
    text = str(value).lower() if isinstance(value, bool) else str(value)
    escaped = "".join(
        f"%{ord(ch):02X}" if ch in _HIVE_ESCAPED else ch for ch in text
    )
    return f"{col}={escaped}"


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    tombstone_col: str | None = None,
    order_col: str | None = None,
    retain_tombstones: bool = False,
) -> DataFrame:
    """Return the merged table: updates win on key collision, new keys
    append, and rows whose update has ``tombstone_col = true`` drop.

    With ``order_col`` the merge is VERSION-CONDITIONAL (``WHEN
    MATCHED AND u.order >= t.order THEN UPDATE``): an update only
    replaces — or a tombstone only deletes — a target row whose
    version it does not precede. That makes applying update sets
    ORDER-INDEPENDENT across calls, which is what a streaming CDC
    feed needs: micro-batches arrive in file order, not event order,
    and an unconditional merge would let a stale revision from a
    late batch clobber a newer one already applied.

    ``retain_tombstones`` keeps a winning delete as a soft-deleted
    ROW (``tombstone_col = true``) instead of physically dropping it.
    Required for full order-independence: a hard delete erases the
    version watermark, so a STALE revision arriving in a later call
    would resurrect the key (nothing is left to out-version it).
    Retained tombstones keep the watermark; readers filter
    ``NOT tombstone_col``, and a vacuum pass can hard-drop tombstones
    once the out-of-order horizon has passed — exactly Kafka/Delta
    tombstone-retention semantics. Requires the target schema to
    carry ``tombstone_col``."""
    cols = target.columns
    if retain_tombstones and not order_col:
        # without a version watermark a retained tombstone cannot
        # out-version anything, and the non-versioned branch below
        # hard-deletes via anti-join — silently ignoring the flag
        # loses exactly the resurrection guard it promises (review
        # finding; the order_col branch already raises for the
        # analogous misuse)
        raise ValueError(
            "retain_tombstones requires order_col: tombstone retention "
            "exists to keep the version watermark, which the "
            "non-versioned merge does not have"
        )
    if order_col:
        t = target.alias("t")
        u = updates.alias("u")
        joined = t.join(u, on=key, how="full_outer")
        # NULL-version semantics: treat NULL as the LOWEST version
        # (and NULL >= NULL as a tie). Without the coalesce,
        # three-valued logic makes upd_wins NULL for any NULL-version
        # row, __drop becomes NULL, and filter(~__drop) silently
        # DISCARDS the live target row — a NULL-version tombstone
        # would hard-delete a row it never out-versioned.
        version_ge = F.coalesce(
            F.col(f"u.{order_col}") >= F.col(f"t.{order_col}"),
            F.col(f"u.{order_col}").isNotNull()
            | F.col(f"t.{order_col}").isNull(),
        )
        is_tomb = (
            F.coalesce(F.col(f"u.{tombstone_col}"), F.lit(False))
            if tombstone_col and tombstone_col in updates.columns
            else F.lit(False)
        )
        # EQUAL-version ties: a tombstone beats a live row regardless
        # of which applied first — otherwise the outcome of
        # {tombstone(v), live(v)} depends on batching (tombstone-first
        # lets the live row "resurrect" on the tie, live-first lets
        # the tombstone delete it). With tombstone>live on ties, both
        # orders converge. (Two DISTINCT live revisions sharing a
        # version remain last-writer-wins — CDC sources must issue
        # unique versions per key for those.)
        t_tomb = (
            F.coalesce(F.col(f"t.{tombstone_col}"), F.lit(False))
            if tombstone_col and tombstone_col in cols
            else F.lit(False)
        )
        # equal-or-both-NULL in one self-documenting expression (the
        # hand-built ge&le pair this replaces was exactly this)
        tie = F.col(f"u.{order_col}").eqNullSafe(F.col(f"t.{order_col}"))
        upd_wins = F.col(f"u.{key}").isNotNull() & (
            F.col(f"t.{key}").isNull()
            | (version_ge & ~tie)
            | (tie & ~(t_tomb & ~is_tomb))
        )
        merged = joined.select(
            F.coalesce(F.col(f"u.{key}"), F.col(f"t.{key}")).alias(key),
            *[
                F.when(upd_wins, F.col(f"u.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
                for c in cols
                if c != key
            ],
            # a winning tombstone deletes (incl. one for an absent key,
            # which upd_wins covers — no row is produced); a LOSING
            # tombstone, older than the live row, must not
            (upd_wins & is_tomb).alias("__drop"),
        )
        if retain_tombstones:
            if not (tombstone_col and tombstone_col in cols):
                raise ValueError(
                    "retain_tombstones requires tombstone_col present in "
                    "the target schema (the soft-delete flag must persist)"
                )
            return merged.drop("__drop")
        return merged.filter(~F.col("__drop")).drop("__drop")
    if tombstone_col and tombstone_col in updates.columns:
        # NULL tombstone = plain upsert. Without the coalesce, a NULL
        # row fails BOTH filters (NOT NULL is NULL) and the update
        # silently vanishes — neither deleted nor applied.
        is_delete = F.coalesce(F.col(tombstone_col), F.lit(False))
        deletes = updates.filter(is_delete).select(key)
        updates = updates.filter(~is_delete).drop(tombstone_col)
        target = target.join(deletes, key, "left_anti")
    t = target.alias("t")
    u = updates.alias("u")
    joined = t.join(u, on=key, how="full_outer")
    merged = joined.select(
        F.coalesce(F.col(f"u.{key}"), F.col(f"t.{key}")).alias(key),
        *[
            F.when(F.col(f"u.{key}").isNotNull(), F.col(f"u.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in cols
            if c != key
        ],
    )
    return merged


def _default_partition_pred(partition_col: str, parts: list):
    """Read predicate selecting exactly the partitions in ``parts``.

    NULL and '' both land in __HIVE_DEFAULT_PARTITION__ on write and
    BOTH read back as NULL — isin(['']) would match nothing, so a
    merge would run against an empty target and the swap would drop
    every non-updated row in the default partition. Either sentinel
    value must pull the whole default partition (isNull; the == ''
    arm covers unpartitioned-to-partitioned migrations where ''
    survives as data)."""
    has_default = any(p is None or str(p) == "" for p in parts)
    non_default = [p for p in parts if not (p is None or str(p) == "")]
    pred = F.col(partition_col).isin(non_default)
    if has_default:
        pred = (
            pred
            | F.col(partition_col).isNull()
            | (F.col(partition_col) == "")
        )
    return pred


def _publish_partition_swaps(
    spark: SparkSession,
    path: str,
    staging: str,
    backup_root: str,
    partition_col: str,
    parts: list,
) -> None:
    """Swap staged partition dirs over the live table and delete
    touched partitions that produced NO staged output (fully
    tombstoned — skipping them would resurface the deletes).
    Matching uses Spark's own dir-name escaping (_hive_partition_dir)
    so escaped values, booleans, and NULL partitions are deleted too.
    Previous generations park OUTSIDE the table root: a
    "<part>__replaced" sibling inside it would read as a bogus
    partition value."""
    from ..fsutil import delete_path, list_subdirs, publish_swap

    staged = set(list_subdirs(spark, staging))
    for part_dir in staged:
        publish_swap(
            spark,
            f"{staging}/{part_dir}",
            f"{path.rstrip('/')}/{part_dir}",
            backup_path=f"{backup_root}/{part_dir}",
        )
    touched = {_hive_partition_dir(partition_col, p) for p in parts}
    for part_dir in set(list_subdirs(spark, path)) - staged:
        if part_dir in touched:
            delete_path(spark, f"{path.rstrip('/')}/{part_dir}")
    delete_path(spark, staging)
    delete_path(spark, backup_root)


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    partition_col: str | None = None,
    tombstone_col: str | None = None,
    order_col: str | None = None,
    retain_tombstones: bool = False,
    validate_immutable_partitions: bool = False,
) -> None:
    """Apply ``merge_upsert`` against a parquet path.

    Both branches stage the merged output to a ``__staging`` sibling
    and publish via rename swap (fsutil.publish_swap) — never an
    in-place overwrite of a path the same job reads, and never a
    driver-side materialization.

    With ``partition_col``: reads ONLY the partitions the updates
    touch, merges, and swaps just those partition directories — the
    rest of the table's files are untouched.

    CONTRACT: ``partition_col`` must be IMMUTABLE per key. The
    pruned merge never reads partitions the updates don't name, so
    an update that MOVES a key to a new partition value would insert
    it there while the stale copy survives untouched in the old
    partition — a duplicate key (review finding; the same contract
    Hive/Glue partitioned MERGEs impose). Time-derived partition
    columns (event month, ingest date) satisfy it naturally. Set
    ``validate_immutable_partitions=True`` to enforce it with an
    extra key-column scan of the UNTOUCHED partitions (column-pruned
    — cheap relative to the merge, but a full-table key read): the
    call raises instead of writing a duplicate.
    """
    from ..fsutil import publish_swap, recover_swaps

    staging = f"{path.rstrip('/')}__staging"
    if partition_col:
        backup_root = f"{path.rstrip('/')}__backup"
        # Crash recovery BEFORE the target read: if a prior run died
        # between publish_swap's renames, the backup holds the only
        # copy of a partition — reading first would merge against an
        # empty partition and the subsequent publish would overwrite
        # the restored backup with the rows-lost merge.
        recover_swaps(spark, path, backup_root)
        parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
        if validate_immutable_partitions:
            # The untouched-partition scan must INCLUDE the NULL
            # (__HIVE_DEFAULT_PARTITION__) partition when the updates
            # don't touch it: for a NULL partition value the isin pred
            # is NULL, and ~NULL is NULL, so a bare negation silently
            # drops exactly the rows a NULL->named partition move
            # leaves stale (ADVICE r5). coalesce(pred, FALSE) makes
            # "not in the touched set" true for them.
            moved = (
                spark.read.parquet(path)
                .filter(
                    ~F.coalesce(
                        _default_partition_pred(partition_col, parts),
                        F.lit(False),
                    )
                )
                .select(key)
                .join(updates.select(key).distinct(), key, "left_semi")
                .limit(1)
                .count()
            )
            if moved:
                raise ValueError(
                    f"update moves key(s) across {partition_col} partitions: "
                    "the pruned merge would duplicate them (partition_col "
                    "must be immutable per key)"
                )
        target = spark.read.parquet(path).filter(
            _default_partition_pred(partition_col, parts)
        )
        merged = merge_upsert(
            target, updates, key, tombstone_col, order_col, retain_tombstones
        )
        (
            merged.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(staging)
        )
        _publish_partition_swaps(
            spark, path, staging, backup_root, partition_col, parts
        )
    else:
        recover_swaps(spark, path)
        target = spark.read.parquet(path)
        merged = merge_upsert(
            target, updates, key, tombstone_col, order_col, retain_tombstones
        )
        merged.write.mode("overwrite").parquet(staging)
        publish_swap(spark, staging, path)


def vacuum_tombstones(
    spark: SparkSession,
    path: str,
    tombstone_col: str,
    order_col: str,
    horizon,
    partition_col: str | None = None,
) -> int:
    """Hard-drop retained tombstone rows whose version is at or below
    ``horizon`` — the point past which no out-of-order revision can
    still arrive (a CDC source's lateness bound). Completes the
    retained-tombstone lifecycle: merge keeps deletes as soft rows so
    stale revisions cannot resurrect keys (see merge_upsert); once the
    horizon passes, the watermark they carry is no longer needed and
    the rows become reclaimable space.

    Returns the number of rows vacuumed. The rewrite reuses the
    staging + rename-swap publish (never in-place) and, when
    ``partition_col`` is given, rewrites ONLY partitions that contain
    a vacuum-able tombstone — the same pruning that keeps MERGE
    viable at 100 TB keeps vacuum viable too.
    """
    from ..fsutil import publish_swap, recover_swaps

    staging = f"{path.rstrip('/')}__staging"
    # NULL order = LOWEST version (merge_upsert's documented
    # semantics), so a NULL-version tombstone is always past any
    # horizon; without the isNull arm it failed BOTH dead and ~dead
    # filters — silently dropped uncounted when its partition was
    # rewritten, immortal otherwise (review finding)
    dead = F.coalesce(F.col(tombstone_col), F.lit(False)) & (
        F.col(order_col).isNull() | (F.col(order_col) <= F.lit(horizon))
    )
    if partition_col:
        backup_root = f"{path.rstrip('/')}__backup"
        recover_swaps(spark, path, backup_root)
        table = spark.read.parquet(path)
        # ONE discovery pass returns both the touched-partition list
        # and the per-partition dead counts (a separate count() would
        # re-scan the touched partitions before the rewrite scan)
        counts = (
            table.filter(dead)
            .groupBy(partition_col)
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        if not counts:
            return 0
        parts = [r[0] for r in counts]
        n = sum(r["__n"] for r in counts)
        scoped = table.filter(_default_partition_pred(partition_col, parts))
        scoped.filter(~dead).write.mode("overwrite").partitionBy(
            partition_col
        ).parquet(staging)
        _publish_partition_swaps(
            spark, path, staging, backup_root, partition_col, parts
        )
        return n
    recover_swaps(spark, path)
    table = spark.read.parquet(path)
    n = table.filter(dead).count()
    if n == 0:
        return 0
    table.filter(~dead).write.mode("overwrite").parquet(staging)
    publish_swap(spark, staging, path)
    return n
