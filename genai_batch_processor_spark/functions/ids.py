"""Deterministic row ids and join-back keys.

The reference relies on input *order*: ``enumerate(data)``
(``openai_batch_processor.py:138``) and a positional zip join
(``examples/vertex_ai/run_text_classifier.py:149``). DataFrames are
unordered, so order must become data: ``row_number()`` over a stable key
(NOT ``monotonically_increasing_id``, which is partition-dependent and
non-contiguous — SURVEY.md §2 #4).

Scale note: a global ``row_number()`` over one window is a single-reducer
sort — fine for assigning ids to a dimension-sized input set, wrong for
100 TB of rows. For huge inputs prefer a natural key (already present in
every fixture table) or ``zipWithIndex``-free composite keys
(partition-id + in-partition ordinal). ``assign_ids`` keeps the
reference-parity semantics; ``custom_id_from_key`` is the scalable path
(key synthesis straight from a natural key, no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_ids(df: DataFrame, order_by: str, id_col: str = "idx") -> DataFrame:
    """0-based dense ordinal (reference ``enumerate`` semantics, oai:138)."""
    w = Window.orderBy(F.col(order_by))
    return df.withColumn(id_col, F.row_number().over(w) - F.lit(1))


def custom_id(idx: Column | str, prefix: str = "request") -> Column:
    """Stable join-back key ``request-{i}`` (run_text_classifier.py:50)."""
    c = F.col(idx) if isinstance(idx, str) else idx
    return F.format_string(f"{prefix}-%d", c.cast("long"))


def custom_id_from_key(key: Column | str, prefix: str = "request") -> Column:
    """Shuffle-free key synthesis from a natural key — the 100 TB path."""
    c = F.col(key) if isinstance(key, str) else key
    return F.format_string(f"{prefix}-%d", c.cast("long"))


def extract_index(cid: Column | str) -> Column:
    """Parse the ordinal back out of ``request-{i}``
    (run_text_classifier.py:106)."""
    c = F.col(cid) if isinstance(cid, str) else cid
    return F.split(c, "-").getItem(1).cast("long")
