"""Snapshot diffing for incremental pipelines (north-star, §2.D).

A 100 TB corpus is not rebuilt per run — it evolves. The reference
reprocesses its whole input every ``run()`` (``openai_batch_processor
.py:277``); an incremental engine instead diffs the new snapshot
against the previous one and feeds ONLY added/changed rows through the
paid inference boundary (composing with ``operators.batching`` for the
submit set and ``sources.upsert`` for applying results).

Design: one full outer join on the key — the single unavoidable
shuffle, on the same key both snapshots are naturally partitioned by —
with change detection via a portable row fingerprint (md5 over
null-marked concatenated compare columns). Fingerprints, not
column-by-column comparison, so wide rows compare in O(1) per row, the
fingerprint can be persisted WITH the snapshot (next diff then reads
a 2-column relation instead of the full table), and the same value is
DuckDB-replayable for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Field encoding: netstring-style length prefix + separator. A bare
# separator scheme collides when a VALUE contains the separator byte
# (("a\\x1fb","c") vs ("a","b\\x1fc") concatenate identically); the
# length prefix makes the encoding injective for arbitrary bytes —
# essential, since a missed CHANGED row silently skips reprocessing.
# NULL is a distinct marker (no length prefix), never equal to ''.
_SEP = "\x1f"
_NULL = "\x1e"

ADDED, DELETED, CHANGED, UNCHANGED = (
    "added",
    "deleted",
    "changed",
    "unchanged",
)


def row_fingerprint(cols: list[str]) -> Column:
    """Portable md5 fingerprint over the compare columns, null-marked
    and length-prefix encoded (injective for arbitrary values).
    Identical expression exists in ANSI SQL via
    :func:`sql_row_fingerprint`. Lengths are in CHARACTERS — Spark
    ``length`` and DuckDB ``length`` agree on that."""
    parts = []
    for c in cols:
        s = F.col(c).cast("string")
        parts.append(
            F.coalesce(
                F.concat(F.length(s).cast("string"), F.lit(":"), s),
                F.lit(_NULL),
            )
        )
    return F.md5(F.concat_ws(_SEP, *parts))


def sql_row_fingerprint(cols: list[str]) -> str:
    parts = ", ".join(
        f"coalesce(length(CAST({c} AS VARCHAR)) || ':' "
        f"|| CAST({c} AS VARCHAR), chr(30))"
        for c in cols
    )
    return f"md5(concat_ws(chr(31), {parts}))"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    change_col: str = "change",
) -> DataFrame:
    """Classify every key as added / deleted / changed / unchanged.

    Returns the key columns plus ``change``. Both sides are reduced to
    (key, fingerprint) BEFORE the join — the wide payload never enters
    the shuffle, so diffing a 100-column snapshot moves the same bytes
    as diffing a 2-column one."""
    o = old.select(
        *key_cols, row_fingerprint(compare_cols).alias("__fp_old")
    )
    n = new.select(
        *key_cols, row_fingerprint(compare_cols).alias("__fp_new")
    )
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("__fp_old").isNull(), F.lit(ADDED))
        .when(F.col("__fp_new").isNull(), F.lit(DELETED))
        .when(F.col("__fp_old") != F.col("__fp_new"), F.lit(CHANGED))
        .otherwise(F.lit(UNCHANGED))
    )
    return joined.select(*key_cols, change.alias(change_col))


def incremental_rows(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """The rows worth reprocessing: the NEW side filtered to keys whose
    change is added/changed — a semi join of the new snapshot against
    the non-unchanged diff, preserving the full payload only for rows
    that will actually be submitted."""
    diff = snapshot_diff(old, new, key_cols, compare_cols)
    todo = diff.filter(F.col("change").isin(ADDED, CHANGED)).select(
        *key_cols
    )
    return new.join(todo, key_cols, "left_semi")
