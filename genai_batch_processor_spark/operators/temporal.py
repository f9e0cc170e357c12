"""Temporal join operators: as-of (point-in-time) join.

The reference has no join surface at all (SURVEY.md §2.C); as-of joins
are a required primitive for event/feature pipelines (join each event to
the most recent prior state) that Spark lacks natively. This is the
classic union+window formulation:

    tag left=1 / right=0 → union → per-key window ordered by
    (ts, tag, seq) → last_value(right payload, ignoreNulls) carries the
    most recent right row forward → keep left rows.

Scale: ONE shuffle on the join key and a within-partition sort — never
the O(|L|·|R|) expansion of a naive range join, and no per-key
single-reducer (the window partitions by join key). Skewed keys behave
like any skewed window: salt the key or split hot users upstream.

Tie semantics: a right row at exactly left.ts matches (<=, the common
as-of convention and DuckDB's ASOF JOIN default). Equal right timestamps
within a key are broken by ``right_seq`` (latest wins) so results are
deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_seq: str | None = None,
    right_cols: list[str] | None = None,
    how: str = "inner",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row: columns of the nearest right row with the same
    ``on`` key — ``direction='backward'`` takes the most recent right
    row with ``right.ts <= left.ts`` (tie on equal right ts: LATEST
    ``right_seq`` wins), ``'forward'`` the earliest right row with
    ``right.ts >= left.ts`` (tie: LOWEST seq wins) — the pandas
    ``merge_asof`` surface, still one shuffle + one window.

    ``tolerance_seconds`` bounds the match distance; beyond it the
    right columns null out (and ``how='inner'`` drops the row).
    ``right_cols`` are emitted with an ``asof_`` prefix. ``how='left'``
    keeps unmatched left rows with nulls; ``'inner'`` drops them.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_cols]
    )
    seq = F.col(right_seq) if right_seq else F.lit(0)
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        seq.cast("long").alias("__seq"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l = left.select(  # noqa: E741
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(0).cast("long").alias("__seq"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *left.columns,
    )
    if direction == "backward":
        # ascending scan: at equal ts rights sort first (<= matches);
        # equal-ts rights resolve latest-seq-last → latest wins
        order = [F.col("__t").asc(), F.col("__tag").asc(), F.col("__seq").asc()]
    else:
        # descending scan: the last right seen before a left is the
        # SMALLEST ts >= left.ts; equal-ts rights resolve min-seq-last
        order = [F.col("__t").desc(), F.col("__tag").asc(), F.col("__seq").desc()]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r.unionByName(l)
        .withColumn("__asof", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    out = carried.select(
        *left.columns,
        F.col("__asof.__ts").alias(f"asof_{right_ts}"),
        *[F.col(f"__asof.{c}").alias(f"asof_{c}") for c in right_cols],
    )
    if tolerance_seconds is not None:
        lus = F.unix_micros(F.col(left_ts))
        rus = F.unix_micros(F.col(f"asof_{right_ts}"))
        delta = (lus - rus) if direction == "backward" else (rus - lus)
        ok = delta <= int(tolerance_seconds * 1_000_000)
        for c in [f"asof_{right_ts}", *[f"asof_{c}" for c in right_cols]]:
            out = out.withColumn(c, F.when(ok, F.col(c)))
    if how == "inner":
        out = out.filter(F.col(f"asof_{right_ts}").isNotNull())
    return out
