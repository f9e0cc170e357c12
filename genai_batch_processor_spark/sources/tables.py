"""Loaders for the deterministic synthetic tables under /root/testdata.

The reference's "sources" are in-memory iterables and provider files
(SURVEY.md §2.C scans); here every input is a parquet scan so Catalyst
gets pushdown + pruning for free. The `events` table stores
TIMESTAMP(NANOS), which Spark reads as long nanos (see session.py);
we normalize it to a micros timestamp column at load.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS); vanilla sessions reject it
        # with PARQUET_TYPE_ILLEGAL. nanosAsLong is a runtime-settable SQL
        # conf, so set it here — the loader must work under ANY session,
        # not just the one session.get_spark builds.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos-as-long → truncate to micros → timestamp. The fixture DOES
        # carry sub-microsecond parts; truncation loses <1µs per value but
        # matches DuckDB's own nanos→micros truncation exactly, so
        # engine-parity (and any ts arithmetic) stays bit-identical.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views (for spark.sql paths)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
