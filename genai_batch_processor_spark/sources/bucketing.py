"""Bucketed-table sink: pre-shuffled storage for co-located joins.

The reference's only storage layout is a flat JSONL file per batch
(``openai_batch_processor.py:136-145``); it never joins, so layout never
matters. At 100 TB it is the difference between a job that works and one
that dies in shuffle: a fact⋈fact join (orders⋈lineitem) shuffles BOTH
tables every single run, but if both are written bucketed (and sorted)
by the join key into the same bucket count, every future join on that
key is exchange-free — each task zips bucket i of A with bucket i of B.
The shuffle is paid ONCE at write time and amortized over every
downstream query; this is the batch analog of co-partitioned Kafka
topics.

Spark notes:
- ``bucketBy`` requires ``saveAsTable`` (the bucket metadata lives in
  the catalog); an explicit ``path`` keeps the data out of the default
  warehouse and makes the table external.
- reader side needs no hints: the scan reports the hash-partitioning as
  its outputPartitioning and Catalyst drops both Exchanges (and, with
  ``sortBy``, the Sorts).
- bucket counts must MATCH on both sides; pick a count that keeps
  buckets under ~1 GB at target scale (100 TB / 1 GB ≈ 10⁵ buckets —
  round to a power of two per table family).
- Sort elision additionally needs
  ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (runtime
  SQL conf; off by default since Spark 3.0) AND one file per bucket —
  ``write_bucketed`` guarantees the latter. Without the conf the join
  is still exchange-free, just re-sorted per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Materialize ``df`` bucketed (and optionally sorted) by ``key``
    into ``num_buckets`` buckets at ``path``, registered as ``table``.

    The pre-write ``repartition(num_buckets, key)`` uses the same
    murmur3-pmod partitioning as the bucket layout, so every bucket is
    written by exactly one task as exactly one file — the condition
    under which Spark's reader trusts the ``sortBy`` order and elides
    the Sort (with multiple files per bucket only the Exchange is
    elided, not the Sort)."""
    from pyspark.sql import functions as F

    writer = (
        df.repartition(num_buckets, F.col(key))
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    """Unregister a bucketed table (external data stays at its path —
    callers own the path's lifecycle)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
