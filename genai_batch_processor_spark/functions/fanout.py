"""Parallelism floor for compute-heavy per-row stages (optimization
guide §2.5/§6: partitioning must be scale-adaptive, not a constant
tuned for one deployment).

A Spark scan parallelizes by file split, and a parquet file smaller
than ``spark.sql.files.maxPartitionBytes`` (or with a single row
group) yields ONE scan partition — so every narrow, per-row-expensive
stage planned on top of it (vector cosine scoring, literal-centroid
argmin, shingle hashing) runs in a single task no matter how many
cores the cluster has. Profiling round 13 found exactly this: the
in-cell self-join scoring of ``semdedup_survivors`` was one 3.4 s task
on a 32-core box, and each ANN audit branch one 0.65-1.0 s task, while
31 cores idled.

:func:`fan_out` inserts a round-robin repartition to the session's
default parallelism ONLY when the input has fewer partitions than
that floor. At production scale a corpus scan already carries
hundreds-to-thousands of splits, so the condition never triggers and
no exchange is added — the shuffle-free scale designs documented in
``operators/similarity.py`` are unchanged. Locally (one tiny file) it
costs one exchange of the projected columns (project BEFORE calling
this, guide §2.3) and buys the full core count for the expensive
stage.

Round-robin, not hash-by-key: the goal is an even spread for per-row
math, and RoundRobinPartitioning is deterministic under retries
(Spark sorts before round-robin repartition, SPARK-23207). The floor
is ``spark.sparkContext.defaultParallelism`` (= total cores), override
via ``SPARK_GRAFT_MIN_TASKS``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def min_tasks(df: DataFrame) -> int:
    """The parallelism floor: SPARK_GRAFT_MIN_TASKS or the session's
    default parallelism (total cores)."""
    env = os.environ.get("SPARK_GRAFT_MIN_TASKS")
    if env:
        return max(1, int(env))
    return df.sparkSession.sparkContext.defaultParallelism


def fan_out(df: DataFrame, floor: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``floor`` partitions iff it
    currently has fewer — a no-op (no exchange in the plan) whenever
    the scan already meets the floor, i.e. at any real scale. Project
    to the needed columns BEFORE calling (the exchange ships every
    column it is given)."""
    n = floor if floor is not None else min_tasks(df)
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
