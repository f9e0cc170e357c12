"""Copy-on-write upsert over immutable parquet — corpus refresh without
a table format.

Training corpora live on immutable object storage but still need
row-level refresh (re-scored quality, re-deduped shards, license
takedowns). Without a transactional table format the portable pattern
is copy-on-write:

- :func:`upsert_parquet` — full rewrite to a NEW version directory
  (readers flip atomically by path; old version stays for rollback).
- :func:`upsert_partitioned` — dynamic partition overwrite: only the
  partitions the update batch touches are rewritten IN PLACE; a 100 TB
  corpus with a 3-partition update rewrites 3 partitions, not 100 TB.
  Untouched partition files are left bit-identical (asserted in tests).

Upsert semantics: an update row REPLACES the base row with the same
key; unmatched update rows are inserts (the left-anti join keeps every
base row whose key is absent from the updates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _merge(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    survivors = base.join(
        updates.select(key).distinct(), key, "left_anti"
    )
    return updates.unionByName(survivors)


def upsert_parquet(
    spark: SparkSession,
    base_dir: str,
    updates: DataFrame,
    key: str,
    out_dir: str,
) -> None:
    """Full-rewrite upsert into a fresh version directory."""
    base = spark.read.parquet(base_dir)
    _merge(base, updates, key).write.mode("overwrite").parquet(out_dir)


# Collecting one value per touched partition is bounded for date-like
# partition columns (the intended use); a caller who passes a
# high-cardinality column (a key, a uuid) would silently pull the whole
# keyspace to the driver — cap and refuse instead.
MAX_TOUCHED_PARTITIONS = 10_000


def _collect_partition_values(df, part_col: str, context: str) -> list:
    """Distinct ``part_col`` values, capped at MAX_TOUCHED_PARTITIONS —
    the limit rides into the plan (limit(cap+1)), so the driver never
    materializes an unbounded value set before the check fires."""
    rows = df.distinct().limit(MAX_TOUCHED_PARTITIONS + 1).collect()
    if len(rows) > MAX_TOUCHED_PARTITIONS:
        raise ValueError(
            f"{context}: more than {MAX_TOUCHED_PARTITIONS} distinct "
            f"{part_col!r} values touched — {part_col!r} looks like a "
            "high-cardinality column, not a partition column; partition "
            "the table on a bounded column (e.g. a date) or use the "
            "full-rewrite upsert"
        )
    return [r[0] for r in rows]


def upsert_partitioned(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key: str,
    part_col: str,
) -> list:
    """Partition-scoped in-place upsert via dynamic partition overwrite;
    returns the partition values rewritten. The merged relation is
    localCheckpointed before the write — Spark (correctly) refuses to
    overwrite a path that is still a live scan source in the same plan,
    and the checkpoint severs that lineage. The update batch must carry
    ``part_col``; rows may move INTO a partition but a key's old row in
    another partition is only replaced if that partition is also
    touched — keep partition assignment stable under updates (standard
    copy-on-write contract)."""
    parts = _collect_partition_values(
        updates.select(part_col), part_col, "upsert_partitioned"
    )
    if any(v is None for v in parts):
        # isin() never matches NULL, so a null partition would drop all
        # existing null-partition rows from the merge while dynamic
        # overwrite still rewrote __HIVE_DEFAULT_PARTITION__ with only
        # the updates — silent data loss. Refuse instead.
        raise ValueError(
            "upsert_partitioned: update batch has NULL "
            f"{part_col!r} values; assign a real partition first"
        )
    base = spark.read.parquet(table_dir).filter(
        F.col(part_col).isin(parts)
    )
    merged = _merge(base, updates, key).localCheckpoint(eager=True)
    (
        merged.write.partitionBy(part_col)
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(table_dir)
    )
    return parts


def _unescape_partition_value(name: str) -> str:
    """Decode Spark's %XX partition-path escaping (space, ':', '=', …)."""
    out = []
    i = 0
    while i < len(name):
        if name[i] == "%" and i + 3 <= len(name):
            try:
                out.append(chr(int(name[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(name[i])
        i += 1
    return "".join(out)


def _drop_partition_dirs(
    spark: SparkSession, table_dir: str, part_col: str, values: list
) -> None:
    """Remove partition directories via the Hadoop FS API (filesystem-
    agnostic): dynamic overwrite only rewrites partitions PRESENT in the
    output, so a partition whose every row was deleted must be dropped
    explicitly. Directory names are matched by LISTING the table and
    percent-decoding each ``part=value`` dir — building the path by
    string formatting would miss any value Spark escaped on write
    (spaces, ':', '=', …), silently leaving 'erased' data on disk."""
    targets = {str(v) for v in values}
    if not targets:
        return
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(table_dir)
    fs = root.getFileSystem(conf)
    prefix = f"{part_col}="
    for status in fs.listStatus(root):
        if not status.isDirectory():
            continue
        name = status.getPath().getName()
        if not name.startswith(prefix):
            continue
        value = _unescape_partition_value(name[len(prefix):])
        if value in targets:
            fs.delete(status.getPath(), True)


def delete_keys_partitioned(
    spark: SparkSession,
    table_dir: str,
    keys: DataFrame,
    key: str,
    part_col: str,
) -> list:
    """Row-level takedown (license removal, GDPR erasure) rewriting only
    the partitions that actually contain the keys: semi-join locates the
    touched partitions, anti-join drops the rows, dynamic partition
    overwrite replaces those partitions in place — and partitions left
    EMPTY by the delete are removed explicitly (dynamic overwrite cannot
    express an empty partition). Returns the touched partition values."""
    base = spark.read.parquet(table_dir)
    touched = _collect_partition_values(
        base.join(keys, key, "left_semi").select(part_col),
        part_col,
        "delete_keys_partitioned",
    )
    if not touched:
        return []
    if any(v is None for v in touched):
        # isin() can't scope a NULL partition and the default-partition
        # dir name doesn't round-trip through value matching — refuse
        # rather than silently skipping those rows' erasure.
        raise ValueError(
            "delete_keys_partitioned: matched rows live in a NULL "
            f"{part_col!r} partition; erase those with a full rewrite"
        )
    scoped = base.filter(F.col(part_col).isin(touched))
    kept = scoped.join(keys, key, "left_anti").localCheckpoint(
        eager=True
    )
    surviving = [
        r[0] for r in kept.select(part_col).distinct().collect()
    ]
    if surviving:
        (
            kept.write.partitionBy(part_col)
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(table_dir)
        )
    emptied = sorted(set(touched) - set(surviving))
    _drop_partition_dirs(spark, table_dir, part_col, emptied)
    return sorted(touched)
