"""Small-files compaction: rewrite a fragmented parquet dataset into
size-targeted files.

A 24/7 ingest (streaming micro-batches, per-job shards like the
reference's one-JSONL-per-batch layout) accumulates thousands of tiny
files; at 100 TB that murders the scan path — every file costs a
driver-side listing entry, a task, an open, and a footer read. The fix
is periodic compaction: read, repartition to ceil(bytes / target), and
rewrite. Sizing comes from the actual on-disk byte count via the Hadoop
FileSystem API (works for file://, hdfs://, gs://, s3a:// alike), not a
row-count guess, so compacted files land near the target regardless of
schema width or compression ratio.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under ``path``, recursively, via the
    Hadoop FS API — filesystem-agnostic and driver-side only."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    n = 0
    total = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, metadata
        n += 1
        total += f.getLen()
    return n, total


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite ``src_dir`` into ``dst_dir`` with files sized toward
    ``target_bytes``; returns the output file count. A round-robin
    ``repartition(n)`` (one shuffle) gives uniform file sizes; readers
    of the compacted copy pay one task per ~target_bytes instead of one
    per ingest shard."""
    _, total = dir_stats(spark, src_dir)
    n = max(1, math.ceil(total / target_bytes))
    df: DataFrame = spark.read.parquet(src_dir)
    df.repartition(n).write.mode("overwrite").parquet(dst_dir)
    return n
