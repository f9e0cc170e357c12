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


def inject_hot_key(
    df: DataFrame,
    key_col: str = "user_id",
    entropy_col: str = "event_id",
    hot_milli: int = 400,
    hot_value: int = 0,
) -> DataFrame:
    """Deterministically remap ``hot_milli``/1000 of the rows' key to a
    single hot value — the skew-injection twin of the salted remedies,
    used by the AQE demonstration (tools/aqe_skew_check.py) and its
    pytest plan assertion. Hash of the unique ``entropy_col`` (never
    rand()) so reruns, A/B variants and plan asserts all see the SAME
    skew."""
    return df.withColumn(
        key_col,
        F.when(
            F.pmod(F.hash(entropy_col), F.lit(1000)) < hot_milli,
            F.lit(hot_value).cast("long"),
        ).otherwise(F.col(key_col)),
    )


# Local-fixture byte thresholds for the AQE skew-split demo: the split
# triggers on PARTITION BYTES (cluster default 256 MB — right for real
# executors, unreachable on a megabyte local fixture), so the demo
# scales the knobs to the data, exactly what a real deployment does per
# its own shuffle sizes. coalescePartitions.minPartitionSize must scale
# DOWN with the advisory size: the split target is clamped to it, and
# the default 1 MB floor silently vetoes any split of a sub-MB hot
# partition (found empirically building this demo).
AQE_DEMO_CONF = {  # sized for the generated sf1 (hot partition ~2 MB)
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "262144",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "131072",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "131072",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
}


def build_skew_demo_dim(spark, events: DataFrame, path: str) -> DataFrame:
    """Materialize the per-user profile dim as a STORED table and read
    it back — both what a real pipeline joins against at scale and a
    structural requirement of the demo: AQE's skew rule pattern-matches
    a sort-merge join whose children are bare shuffle stages, and a
    dim built as an in-plan aggregate leaves a HashAggregate between
    the Sort and the ShuffleQueryStage, silently disqualifying the
    join from skew handling (found empirically building this demo)."""
    events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg("value").alias("avg_value"),
    ).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def run_skew_demo(
    spark,
    events: DataFrame,
    variant: str,
    buckets: int = DEFAULT_SALT_BUCKETS,
    demo_conf: dict[str, str] | None = None,
    dim: DataFrame | None = None,
) -> dict:
    """One run of the skewed fact⋈dim join under a named remedy:
    ``plain`` (AQE skew split OFF — the straggler baseline), ``aqe``
    (Spark's runtime skew split, thresholds from ``demo_conf``), or
    ``salted`` (manual replicate-broadcast :func:`salted_join`).

    The fact side is ``events`` with 40% of rows remapped onto one hot
    user (:func:`inject_hot_key`); the dim side is the per-user profile
    aggregate of the SAME relation. autoBroadcastJoinThreshold is
    disabled for the sort-merge variants — in the 100 TB story the dim
    does not fit a broadcast, which is precisely when skew bites.

    Returns ``{"rows": n, "groups": {event_type: n}, "skew_marker":
    bool}``: ``groups`` carries the exact per-type counts so callers
    can assert the three remedies agree on the RESULT, not merely on
    the group-key cardinality (the fixture always has 5 event types,
    so a bare row count could not catch a salt-fanout duplicating rows
    or the hot key being dropped); ``skew_marker`` reports whether the
    FINAL adaptive plan (post-execution) contains Spark's ``skew=true``
    join annotation. Session conf is saved and restored around the
    run."""
    if variant not in ("plain", "aqe", "salted"):
        raise ValueError(f"unknown variant {variant!r}")
    # Pre-shuffle by the high-entropy id so the join exchange has MANY
    # map-side parents. This is not cosmetic: AQE splits a skewed
    # reduce partition at MAP-OUTPUT boundaries, and the single-file
    # (single-row-group) local fixture otherwise collapses to ONE map
    # task — an unsplittable hot partition no matter the thresholds.
    # On a real cluster the thousands of upstream tasks provide this
    # granularity for free; the repartition stands in for them.
    fact = inject_hot_key(events.repartition(32, "event_id"))
    own_dim_dir = None
    if dim is None:
        import tempfile

        own_dim_dir = tempfile.mkdtemp(prefix="skew_demo_dim_")
        dim = build_skew_demo_dim(spark, events, own_dim_dir)
    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": (
            "false" if variant == "plain" else "true"
        ),
    }
    if variant == "aqe":
        conf.update(demo_conf or AQE_DEMO_CONF)
    saved = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        if variant == "salted":
            joined = salted_join(fact, dim, "user_id", "event_id", buckets)
        else:
            joined = fact.join(dim, "user_id")
        out = joined.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulation: the three variants sum in different
            # orders (SMJ partition order vs salted-bucket order), and a
            # double sum over ~1M rows can differ across orders by more
            # than any fixed rounding — decimal sums are order-exact, so
            # cross-variant equality is a strict check, not a tolerance
            F.sum(
                (F.col("value") + F.col("avg_value")).cast("decimal(28,6)")
            ).alias("weighted"),
        )
        # collect() (tiny per-event-type aggregate), NOT count(): count
        # compiles a SEPARATE query execution, leaving `out`'s own plan
        # unexecuted — its explain would show the pre-AQE plan with no
        # final-stage skew annotation regardless of what actually ran
        collected = out.collect()
        # post-action explain: with AQE the string now shows the FINAL
        # plan (isFinalPlan=true), where a split skew join is annotated.
        # Captured via the PUBLIC df.explain() (stdout redirect) — the
        # earlier private _jdf.queryExecution()/_jvm ExplainMode route
        # breaks on Spark Connect and across version churn, and a silent
        # API change there would flip skew_marker to False misleadingly.
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain(mode="simple")
        final_plan = buf.getvalue()
        return {
            "rows": len(collected),
            "groups": {
                r["event_type"]: (r["n"], str(r["weighted"]))
                for r in collected
            },
            "skew_marker": "skew=true" in final_plan,
        }
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        if own_dim_dir is not None:
            import shutil

            # the collect above fully consumed the dim; drop the
            # throwaway parquet dir rather than leaking one per call
            shutil.rmtree(own_dim_dir, ignore_errors=True)
