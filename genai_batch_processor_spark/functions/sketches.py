"""Deterministic cardinality sketches (KMV / k-minimum-values).

``approx_count_distinct`` (HLL++) is the built-in scale path, but its
binary sketch is engine-specific — it cannot be oracle-checked and two
engines disagree on the estimate. KMV over the portable md5 hash is the
deterministic alternative: keep the k smallest hash values of a set;
the k-th smallest m (as a fraction of the hash space) estimates the
cardinality as (k-1)/m. Same hashes → same sketch → same estimate on
ANY engine, which makes the sketch itself testable (SURVEY.md §5) and
mergeable across partitions/engines by a simple min-k union.

Scale shape: the implementation below distincts the hash relation and
rank-filters the k smallest per group — one shuffle on the group key,
bounded output (k rows/group). At true 100 TB scale the upgrade is a
bounded-state UDAF (k-element heap per partition, min-k merge), same
math, no per-group sort; the SQL-visible contract here is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from genai_batch_processor_spark.functions import hashing

KMV_K = 16  # fixture-sized so the estimator path actually runs (vocab ≈ 31)
HASH_SPACE = float(1 << 60)  # portable_hash60 range


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-group distinct-count estimate: (group, est_distinct).

    Groups with fewer than k distinct values report the EXACT count
    (their full hash set fits in the sketch); larger groups use the
    (k-1)/m estimator with ~1/sqrt(k) relative error."""
    # NULL values are not values: unfiltered, the NULL hash occupies a
    # rank-1 slot in Spark (nulls sort FIRST) but ranks LAST in DuckDB,
    # skewing the k-th minimum differently on each engine (fuzz-pinned)
    hashed = (
        df.select(
            F.col(group_col).alias("__g"),
            hashing.portable_hash60(value_col).alias("__h"),
        )
        .filter(F.col("__h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("__g").orderBy("__h")
    topk = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
    )
    per = topk.groupBy("__g").agg(
        F.max("__h").alias("__kth"), F.count(F.lit(1)).alias("__nk")
    )
    est = (
        F.when(F.col("__nk") < k, F.col("__nk").cast("double"))
        .otherwise(
            F.round(
                F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("__kth"), 2
            )
        )
    )
    return per.select(
        F.col("__g").alias(group_col), est.alias("est_distinct")
    )


def sql_kmv_distinct(
    relation_sql: str, group_col: str, value_expr: str, k: int = KMV_K
) -> str:
    """DuckDB twin: same hashes, same rank-filter, same estimator."""
    h = hashing.sql_hash60(value_expr)
    return f"""
    WITH __hashed AS (
      SELECT DISTINCT {group_col} AS g, {h} AS h FROM ({relation_sql})
      WHERE {h} IS NOT NULL
    ), __ranked AS (
      SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
      FROM __hashed
    ), __per AS (
      SELECT g, max(h) AS kth, count(*) AS nk
      FROM __ranked WHERE rn <= {k} GROUP BY g
    )
    SELECT g AS {group_col},
           CASE WHEN nk < {k} THEN CAST(nk AS DOUBLE)
                ELSE round({float(k - 1)} * {HASH_SPACE} / kth, 2)
           END AS est_distinct
    FROM __per
    """
