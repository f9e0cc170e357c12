"""Deterministic row ids and join-back keys.

The reference relies on input *order*: ``enumerate(data)``
(``openai_batch_processor.py:138``) and a positional zip join
(``examples/vertex_ai/run_text_classifier.py:149``). DataFrames are
unordered, so order must become data: ``row_number()`` over a stable key
(NOT ``monotonically_increasing_id``, which is partition-dependent and
non-contiguous — SURVEY.md §2 #4).

Scale design: a bare ``row_number()`` over an unpartitioned window is a
single-reducer sort (every row through ONE task — impossible at 100 TB).
``assign_ids`` instead buckets the key space by VALUE into
deterministic, data-derived ranges: per-bucket ``row_number`` plus a
driver-computed running offset gives the identical dense global ordinal
with parallelism = number of buckets. Value-derived buckets (not
``repartitionByRange``) on purpose: range-exchange boundaries come from
per-execution sampling, and the offsets job and the final job could see
DIFFERENT boundaries — value bucketing is a pure function of the data,
so both jobs agree. Cost: 2 tiny agg jobs (min/max, per-bucket counts)
before the one real shuffle; skewed key distributions skew buckets
(raise ``buckets`` or pre-map the key if so). String keys bucket by a
numeric PROXY — the first 7 UTF-8 bytes zero-padded and read as an
integer — which is monotone non-decreasing w.r.t. Spark's string
ordering (UTF8String compares raw bytes; zero-padding is the infimum
of all extensions; the double rounding above 2^53 is itself monotone),
so per-bucket ranking by the REAL key still composes into the exact
global ordinal. Only exotic key types (binary, struct, …) fall back to
the single-window path (fine for dimension-sized inputs).

``custom_id_from_key`` is the zero-shuffle path when a natural key
already exists (every fixture table has one).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType, T.DateType, T.TimestampType,
)


def _order_proxy(order_by: str, dtype) -> Column | None:
    """Numeric bucket coordinate, monotone non-decreasing w.r.t. the
    key's sort order — or None when the type has no cheap proxy."""
    if isinstance(dtype, _NUMERIC):
        return F.col(order_by).cast("double")
    if isinstance(dtype, T.StringType):
        # First 7 UTF-8 bytes, zero-padded, as a base-256 integer:
        # key1 < key2 (byte-wise, which IS Spark string ordering)
        # implies proxy1 <= proxy2. 7 bytes = 14 hex digits < 2^56,
        # inside conv's long range.
        return F.conv(
            F.hex(F.expr(f"rpad(encode(`{order_by}`, 'UTF-8'), 7, x'00')")),
            16,
            10,
        ).cast("double")
    return None


def assign_ids(
    df: DataFrame,
    order_by: str,
    id_col: str = "idx",
    buckets: int | None = None,
) -> DataFrame:
    """0-based dense ordinal by ``order_by`` (reference ``enumerate``
    semantics, oai:138), computed with bucket-parallel ranking."""
    key = F.col(order_by)
    dtype = df.schema[order_by].dataType
    if buckets is None:
        buckets = df.sparkSession.sparkContext.defaultParallelism * 2

    knum = _order_proxy(order_by, dtype)
    if knum is None or buckets <= 1:
        w = Window.orderBy(key)
        return df.withColumn(id_col, F.row_number().over(w) - F.lit(1))
    lo, hi = df.agg(F.min(knum), F.max(knum)).first()
    if lo is None or lo == hi:
        w = Window.orderBy(key)
        return df.withColumn(id_col, F.row_number().over(w) - F.lit(1))

    width = (hi - lo) / buckets
    # NULL keys sort FIRST under Window.orderBy (nulls-first), so they
    # must land in a bucket BEFORE every non-null key. Without the
    # explicit branch, floor(NULL) is NULL and least(NULL, n) skips the
    # null — silently assigning null-key rows to the LAST bucket and
    # breaking the exact-global-ordinal contract vs the fallback path.
    bucket = (
        F.when(knum.isNull(), F.lit(-1))
        .otherwise(
            F.least(
                F.floor((knum - F.lit(lo)) / F.lit(width)),
                F.lit(buckets - 1),
            )
        )
        .cast("int")
    )
    bucketed = df.withColumn("__bucket", bucket)
    counts = {
        r["__bucket"]: r["cnt"]
        for r in bucketed.groupBy("__bucket")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    offset_map = F.create_map(
        *[F.lit(v) for kv in offsets.items() for v in kv]
    )
    w = Window.partitionBy("__bucket").orderBy(key)
    return bucketed.withColumn(
        id_col,
        (F.row_number().over(w) - 1 + offset_map[F.col("__bucket")]).cast(
            "long"
        ),
    ).drop("__bucket")


def custom_id(idx: Column | str, prefix: str = "request") -> Column:
    """Stable join-back key ``request-{i}`` (run_text_classifier.py:50)."""
    c = F.col(idx) if isinstance(idx, str) else idx
    return F.format_string(f"{prefix}-%d", c.cast("long"))


def custom_id_from_key(key: Column | str, prefix: str = "request") -> Column:
    """Shuffle-free key synthesis from a natural key — the 100 TB path."""
    c = F.col(key) if isinstance(key, str) else key
    return F.format_string(f"{prefix}-%d", c.cast("long"))


def retry_custom_id(
    key: Column | str, attempt: int, prefix: str = "request"
) -> Column:
    """Attempt-salted join-back key: ``request-{i}`` on the first
    attempt, ``request-{i}-r{attempt}`` on resubmits. A resubmitted
    request must NOT reuse its failed custom_id — providers reject
    duplicate ids within a batch, and a fresh id keeps each attempt's
    response row distinct in the result relation. ``extract_index``
    still parses the ordinal (the suffix rides after it)."""
    base = custom_id_from_key(key, prefix)
    if attempt <= 1:
        return base
    return F.format_string("%s-r%d", base, F.lit(attempt))


def extract_index(cid: Column | str) -> Column:
    """Parse the ordinal back out of ``request-{i}``
    (run_text_classifier.py:106)."""
    c = F.col(cid) if isinstance(cid, str) else cid
    return F.split(c, "-").getItem(1).cast("long")
