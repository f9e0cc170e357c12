"""Skew mitigation operators: salted two-phase aggregation and salted
broadcast-fanout joins.

The reference never aggregates or joins at all (SURVEY.md §2.C), but at
100 TB a handful of hot keys — one dominant ``event_type``, one viral
``user_id`` — turns a single reducer into the job's critical path. Two
standard remedies, both pure DataFrame:

- **Salted aggregation**: split every hot key into ``buckets`` synthetic
  sub-keys, partially aggregate per (key, salt), then merge per key. The
  second shuffle moves only ``n_keys × buckets`` partial rows, and no
  single reducer ever sees more than ~1/buckets of a hot key's rows.
  All merged measures must be decomposable (count/sum/min/max); means
  come from sum+count at the end.
- **Salted join** (replicate-broadcast): explode the SMALL side
  ``buckets``× with an explicit salt column, salt the big side's key by
  a hash of a high-entropy column, and join on (key, salt) — each hot
  key's rows spread over ``buckets`` reducers instead of one. AQE's
  skewJoin handles moderate skew automatically (session.py enables it);
  this operator is for the pathological keys AQE can't split because a
  single key-group exceeds one partition.

Salts derive from a deterministic column hash (never ``rand()``), so
results — and the driver's oracle hash-compare — are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def salt_column(entropy_col: str | Column, buckets: int) -> Column:
    """Deterministic salt in [0, buckets): hash of a high-entropy column
    (a unique id, a timestamp), NOT rand() — reruns and oracle replays
    must land every row in the same bucket."""
    return F.pmod(F.hash(entropy_col), F.lit(buckets)).cast("int")


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    entropy_col: str,
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-phase skew-proof aggregation: per-key count + decimal-exact
    sum of ``value_col``. Phase 1 groups by (keys, salt) so a hot key is
    spread over ``buckets`` reducers; phase 2 merges the tiny partial
    relation. Results are identical to a plain groupBy — the salt is
    invisible in the output — which is exactly what the paired oracle
    checks."""
    salted = df.withColumn("__salt", salt_column(entropy_col, buckets))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__sum"),
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__n").alias("n"),
        F.sum("__sum").cast("double").alias("total_value"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    entropy_col: str,
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Inner equi-join resilient to hot keys in ``big``: the small side
    is exploded ``buckets``× (one copy per salt value) and broadcast, the
    big side is salted deterministically, and the join runs on
    (key, salt). Row multiplicity is unchanged — each big-side row meets
    exactly one replica of its key."""
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(buckets - 1))
    ).alias("__salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("__salt", salt_column(entropy_col, buckets))
    return (
        big_salted.join(F.broadcast(small_rep), on=[key, "__salt"])
        .drop("__salt")
    )
