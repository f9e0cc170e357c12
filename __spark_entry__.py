"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end batch-GenAI pipeline on
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 with its DuckDB oracle. Implementation lives in
``genai_batch_processor_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from genai_batch_processor_spark import oracles as _oracles
from genai_batch_processor_spark import queries as _queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The full reference lifecycle (SURVEY.md §3 entry 1) minus the network:
    load documents → ids → prompts → typed requests → JSONL encode →
    deterministic mock respond → JSONL parse → extract/answer → join-back.
    """
    return _queries.q_joinback(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twins for each query (driver hash-compare gate)."""
    return dict(_oracles.ORACLES)
