"""Streaming tests: the availableNow stream must reproduce the batch
twins exactly, and stateful state must survive across micro-batches."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from genai_batch_processor_spark import queries
from genai_batch_processor_spark.sources.tables import load_table
from genai_batch_processor_spark.streaming import windows as sw


def _split_events_dir(spark, sf_dir, out_dir: str, n_splits: int = 2) -> None:
    """Copy the events fixture into n parquet files (one per micro-batch
    with maxFilesPerTrigger=1), split by event_id modulo."""
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    for i in range(n_splits):
        raw.filter(F.col("event_id") % n_splits == i).coalesce(1).write.mode(
            "append"
        ).parquet(out_dir)


def test_streaming_hourly_matches_batch(spark, sf_dir, tmp_path):
    stream_dir = str(tmp_path / "ev_stream")
    _split_events_dir(spark, sf_dir, stream_dir)
    stream = sw.stream_events(spark, stream_dir)
    agg = sw.hourly_counts(stream)
    sw.run_to_memory(agg, "hourly_mem", "complete", str(tmp_path / "ckpt1"))
    got = {
        (r.hour, r.event_type): (r.n, r.total_value)
        for r in spark.table("hourly_mem").collect()
    }
    want = {
        (r.hour, r.event_type): (r.n, r.total_value)
        for r in queries.q_events_hourly(spark, sf_dir).collect()
    }
    assert got == want


def test_stateful_user_stats_across_microbatches(spark, sf_dir, tmp_path):
    stream_dir = str(tmp_path / "ev_stream2")
    _split_events_dir(spark, sf_dir, stream_dir, n_splits=3)
    stream = sw.stream_events(spark, stream_dir, max_files_per_trigger=1)
    stats = sw.user_stats_stream(stream)
    sw.run_to_memory(stats, "user_mem", "update", str(tmp_path / "ckpt2"))
    out = spark.table("user_mem").toPandas()
    # update mode emits one row per key per batch it appears in; the LAST
    # emission per user carries the accumulated totals
    final = out.groupby("user_id").last()
    ev = load_table(spark, sf_dir, "events")
    want = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    got = {uid: int(row["n_events"]) for uid, row in final.iterrows()}
    assert got == want
    # state crossed batches: users seen in >1 batch emitted >1 row
    multi = out.groupby("user_id").size()
    assert (multi > 1).any()
    shutil.rmtree(stream_dir, ignore_errors=True)


def test_foreach_batch_sink_idempotent_restart(spark, sf_dir, tmp_path):
    """run_to_parquet: the foreachBatch parquet sink must (a) reproduce
    the batch aggregation exactly, and (b) write NOTHING new when a
    finished availableNow run restarts from the same checkpoint —
    exactly-once end-to-end."""
    import os

    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")
    stream = sw.stream_events(spark, sf_dir, glob_filter="events.parquet")
    agg = sw.hourly_counts(stream)
    sw.run_to_parquet(agg, out, ckpt, output_mode="complete")

    def snapshot():
        files = []
        for root, _, names in os.walk(out):
            files += [
                os.path.join(root, n)
                for n in names
                if n.endswith(".parquet")
            ]
        return sorted(files)

    first = snapshot()
    # complete mode: each batch dir is a full snapshot — read the latest
    latest = max(
        (d for d in os.listdir(out) if d.startswith("batch=")),
        key=lambda d: int(d.split("=")[1]),
    )
    got = {
        (r.hour, r.event_type): (r.n, r.total_value)
        for r in spark.read.parquet(f"{out}/{latest}").collect()
    }
    want = {
        (r.hour, r.event_type): (r.n, r.total_value)
        for r in queries.q_events_hourly(spark, sf_dir).collect()
    }
    assert got == want

    # restart from the same checkpoint: no new batch dirs, same files
    stream2 = sw.stream_events(spark, sf_dir, glob_filter="events.parquet")
    sw.run_to_parquet(
        sw.hourly_counts(stream2), out, ckpt, output_mode="complete"
    )
    assert snapshot() == first


def test_watermark_semantics_on_late_batch(spark, sf_dir, tmp_path):
    """Pins Spark's ACTUAL watermark guarantee, which is one-directional:
    data within the watermark is aggregated exactly; data arriving
    after the watermark passed MAY still aggregate — the watermark
    bounds STATE, it is not a strict input filter. Concretely: a
    days-late micro-batch whose windows were never in state aggregates
    fresh and emits in the late batch (no silent loss), which is why
    append-mode consumers must merge by window key downstream (the
    complete-snapshot foreachBatch pattern sidesteps this entirely)."""
    import os

    stream_dir = str(tmp_path / "ev_late")
    os.makedirs(stream_dir)
    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg(
        F.date_add(F.min(F.to_date("ts")), 5).alias("c")
    ).collect()[0]["c"]
    old = ev.filter(F.to_date("ts") < F.lit(cutoff))
    new = ev.filter(F.to_date("ts") >= F.lit(cutoff))
    assert old.count() > 0 and new.count() > 0

    raw_long = lambda df: df.withColumn(  # noqa: E731
        "ts", F.unix_micros("ts") * 1000
    )
    raw_long(new).coalesce(1).write.mode("append").parquet(stream_dir)
    raw_long(old).coalesce(1).write.mode("append").parquet(stream_dir)
    new_count = new.count()
    for f in os.listdir(stream_dir):
        if not f.endswith(".parquet"):
            continue
        full = os.path.join(stream_dir, f)
        n = spark.read.parquet(full).count()
        t = 1_000_000_000 if n == new_count else 2_000_000_000
        os.utime(full, (t, t))  # new file replays first

    stream = sw.stream_events(spark, stream_dir, max_files_per_trigger=1)
    agg = sw.hourly_counts(stream)  # 2h watermark
    per_batch: dict[int, set] = {}

    def sink(df, eid):
        per_batch[eid] = {r.hour for r in df.select("hour").collect()}

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_l"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    old_hours = {
        r[0]
        for r in old.select(
            F.date_format(
                F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss"
            )
        ).distinct().collect()
    }
    # batch 0 (watermark still at epoch): nothing closes, nothing emits
    assert per_batch[0] == set()
    # the late batch's windows emit THERE — late data is re-aggregated
    # after state eviction, never silently lost
    assert old_hours <= per_batch[1]
