"""Round-14 optimization internals: the fan_out split estimator, the
volume-derived streaming drain partitions, and the scale-free
assign_ids bucket function (r13 verdict items 1, 5, 7)."""

from __future__ import annotations

import math
import os
import random

import pytest
from pyspark.sql import functions as F

from genai_batch_processor_spark.functions import fanout, ids
from genai_batch_processor_spark.sources.tables import load_table
from genai_batch_processor_spark.streaming import windows as sw


# -- fan_out / estimated_scan_partitions -------------------------------------


def test_estimator_matches_fixture_scan_and_no_rdd(spark, sf_dir):
    """A one-file fixture scan must estimate tiny (=> fan_out fires),
    and the estimate must come from the analyzed plan, not an RDD
    conversion (no physical planning: this is the r13-verdict fix)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    est = fanout.estimated_scan_partitions(docs)
    assert est is not None and est >= 1
    assert est < spark.sparkContext.defaultParallelism
    fanned = fanout.fan_out(docs)
    plan = fanned._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan


def test_estimator_none_for_non_file_leaves(spark):
    """Local/range relations cannot be priced from file stats — the
    estimator must decline (fan_out then falls back to the RDD probe)
    rather than guess."""
    assert fanout.estimated_scan_partitions(spark.range(10)) is None


def test_fan_out_skips_when_floor_met(spark, sf_dir):
    """est >= floor must add NO exchange (the at-scale no-op branch)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = fanout.fan_out(docs, floor=1)
    assert out is docs  # same object: no repartition applied


def test_min_tasks_env_override_validated(spark, sf_dir, monkeypatch):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    monkeypatch.setenv("SPARK_GRAFT_MIN_TASKS", "7")
    assert fanout.min_tasks(docs) == 7
    monkeypatch.setenv("SPARK_GRAFT_MIN_TASKS", "bogus")
    with pytest.warns(UserWarning):
        n = fanout.min_tasks(docs)
    assert n == spark.sparkContext.defaultParallelism


# -- stream_partitions_for ---------------------------------------------------


def test_stream_partitions_small_floor_and_scale_floor(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_STREAM_PARTITIONS", raising=False)
    base = sw.STREAM_PARTITIONS_BASE
    tgt = sw.STREAM_TARGET_BYTES_PER_PARTITION
    dp = spark.sparkContext.defaultParallelism
    # unknown or tiny volume -> the small-keyspace floor (local twins)
    assert sw.stream_partitions_for(spark, None) == base
    assert sw.stream_partitions_for(spark, 1) == base
    assert sw.stream_partitions_for(spark, base * tgt) == base
    # large volume -> bytes-derived, never below default parallelism
    big = 1000 * tgt
    n = sw.stream_partitions_for(spark, big)
    assert n == max(1000, dp)
    mid = (base + 1) * tgt
    assert sw.stream_partitions_for(spark, mid) == max(base + 1, dp)
    # env override wins; malformed value warns and falls through
    monkeypatch.setenv("SPARK_GRAFT_STREAM_PARTITIONS", "12")
    assert sw.stream_partitions_for(spark, big) == 12
    monkeypatch.setenv("SPARK_GRAFT_STREAM_PARTITIONS", "junk")
    with pytest.warns(UserWarning):
        assert sw.stream_partitions_for(spark, None) == base


def test_stream_state_partitions_derives_from_path(spark, sf_dir):
    """The context manager must hold the derived count for the drain
    and restore the session default afterwards."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    events = sf_dir.rstrip("/") + "/events.parquet"
    assert sw.dir_bytes(spark, events) > 0
    with sw.stream_state_partitions(spark, input_path=events):
        held = int(spark.conf.get("spark.sql.shuffle.partitions"))
        assert held == sw.STREAM_PARTITIONS_BASE  # fixture-scale volume
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_drain_sizes_epochs_to_batch_volume(spark, tmp_path):
    """_drain_foreach_batch must size spark.sql.shuffle.partitions per
    epoch from that epoch's file bytes (r13 verdict item 1: the
    constant 8 would serialize catch-up epochs at scale)."""
    import shutil

    from genai_batch_processor_spark.streaming import ingest

    src = str(tmp_path / "src")
    for i in range(2):
        (
            spark.range(i * 100, (i + 1) * 100, 1, 1)
            .write.mode("append")
            .parquet(src)
        )
    seen: list[int] = []

    def probe(batch_df, epoch_id):
        seen.append(int(spark.conf.get("spark.sql.shuffle.partitions")))

    stream = (
        spark.readStream.schema("id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ckpt = str(tmp_path / "ckpt")
    try:
        ingest._drain_foreach_batch(spark, stream, probe, ckpt)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    assert len(seen) == 2
    # tiny epochs -> the small floor, derived per epoch
    assert all(n == sw.STREAM_PARTITIONS_BASE for n in seen)


# -- scale-free assign_ids bucketing -----------------------------------------


def _adversarial_doubles() -> list[float | None]:
    random.seed(7)
    vals: list[float | None] = [
        0.0,
        -0.0,
        float("inf"),
        float("-inf"),
        float("nan"),
        5e-324,
        -5e-324,
        1.7976931348623157e308,
        -1.7976931348623157e308,
        None,
        None,
    ]
    for k in range(-1074, 1025, 149):
        v = math.ldexp(1.0, k)
        vals += [
            v,
            math.nextafter(v, float("inf")),
            math.nextafter(v, 0.0),
            -v,
        ]
    vals += [random.uniform(-1e9, 1e9) for _ in range(100)]
    return vals


def test_scale_free_bucket_monotone_on_adversarial_doubles(spark):
    """The data-independent bucket id must be monotone non-decreasing
    w.r.t. Spark's double sort order (NULL first, NaN last), including
    at power-of-two boundaries, denormals and the exponent extremes —
    the property the exact-global-ordinal composition rests on."""
    vals = _adversarial_doubles()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "rid long, key double"
    )
    out = (
        df.withColumn("b", ids._scale_free_bucket(F.col("key")))
        .orderBy(F.col("key").asc_nulls_first())
        .select("key", "b")
        .collect()
    )
    buckets = [r["b"] for r in out]
    assert buckets == sorted(buckets), "bucket id not monotone in key order"


def test_assign_ids_one_pass_matches_single_window(spark):
    """The collect-free bucketed path must produce the exact ordinals
    of the single-window reference on unique keys of every proxy
    type."""
    random.seed(11)
    for schema, keys in [
        ("key long", random.sample(range(-(10**12), 10**12), 300)),
        ("key double", [random.uniform(-1e300, 1e300) for _ in range(300)]),
        (
            "key string",
            [f"{random.randrange(16**8):08x}-{i}" for i in range(300)],
        ),
    ]:
        rows = [(i, k) for i, k in enumerate(keys)]
        df = spark.createDataFrame(rows, "rid long, " + schema)
        got = {r["rid"]: r["idx"] for r in ids.assign_ids(df, "key").collect()}
        want = {
            r["rid"]: r["idx"]
            for r in ids.assign_ids(df, "key", buckets=1).collect()
        }
        assert got == want, f"ordinal mismatch for {schema}"


def test_assign_ids_single_bounded_pre_job(spark, sf_dir):
    """The ordinal preamble must run exactly ONE bounded job (the
    counts materialization) — one fewer than the old min/max +
    counts-collect pair (r13 verdict item 5) — and the final plan must
    stay free of SinglePartition exchanges."""
    docs = load_table(spark, sf_dir, "documents")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    out = ids.assign_ids(docs, "doc_id")
    after = tracker.getJobIdsForGroup(None)
    n_prejobs = len(after) - len(before)
    assert n_prejobs <= 2, f"expected <= 2 scheduler jobs, saw {n_prejobs}"
    # one ACTION: the counts collect (AQE may split it into two
    # scheduler jobs); the old design ran two actions (min/max +
    # counts), i.e. 2x the scheduler jobs whatever AQE does
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
