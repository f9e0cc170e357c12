"""Epoch-sink compaction (sources/compaction.py): folding a probe
stream's per-micro-batch directories must never change what a reader
or a restarted stream sees — the file layout is maintenance state, the
pair/index relations are the contract."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from genai_batch_processor_spark.sources import compaction
from genai_batch_processor_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _epoch_dir_names(root: str) -> list[str]:
    return sorted(
        n for n in os.listdir(root) if n.startswith("batch=")
    ) if os.path.isdir(root) else []


def test_compact_gc_probe_stream_roundtrip(spark, tmp_path):
    """Drain wave 1, compact + GC both sink roots, drain wave 2 from
    the SAME checkpoint: the restarted stream's probe view must include
    the COMPACTED wave-1 index rows (cross-wave pairs found), and the
    compaction-aware pair read must equal the one-shot probe over both
    waves. Also pins the point of the exercise: fewer directories and
    fewer files after compaction."""
    from genai_batch_processor_spark.operators import dedup
    from genai_batch_processor_spark.queries import INC_DEDUP_OFFSET
    from genai_batch_processor_spark.streaming import ingest

    docs = load_table(spark, SF, "documents")
    index = dedup.minhash_index(docs, "doc_id", "text").persist()
    new_docs = docs.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + INC_DEDUP_OFFSET).alias("doc_id"), "text"
    )
    wave1 = new_docs.filter(F.col("doc_id") % 20 == 3)
    # wave 2 carries a PLANTED duplicate of a wave-1 document (fresh
    # id): its pair is reachable only through wave-1's index rows,
    # which by then exist solely inside the compacted directory — the
    # direct evidence the restarted stream probes compacted coverage.
    victim = wave1.orderBy("doc_id").limit(1).collect()[0]
    planted_id = victim.doc_id + 1_000_000
    wave2 = new_docs.filter(F.col("doc_id") % 20 == 13).unionByName(
        spark.createDataFrame(
            [(planted_id, victim.text)], "doc_id long, text string"
        )
    )
    batch_all = wave1.unionByName(wave2)
    shards = str(tmp_path / "shards")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    pairs_root = os.path.join(out, "pairs")
    index_root = os.path.join(out, "index")

    def drain():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(shards)
        )
        ingest.near_dup_probe_stream_to_parquet(
            stream, index, "doc_id", "text", out, ckpt
        )

    try:
        assert wave1.count() > 0 and wave2.count() > 0
        # >=2 files => >=2 epochs, so keep_last=1 leaves work to compact
        wave1.repartition(2).write.mode("append").parquet(shards)
        drain()
        epochs_before = _epoch_dir_names(index_root)
        assert len(epochs_before) >= 2

        for root in (pairs_root, index_root):
            bound = compaction.compact_epoch_sink(spark, root)
            assert bound is not None
            removed = compaction.gc_epoch_sink(spark, root)
            assert removed  # covered epoch dirs actually deleted
        # covered epoch dirs gone, the newest (keep_last) survives
        left = _epoch_dir_names(index_root)
        assert len(left) == 1 and left[0] == epochs_before[-1]

        wave2.repartition(2).write.mode("append").parquet(shards)
        drain()  # restart: probes compacted wave-1 rows + later epochs
        got = {
            (r.id_a, r.id_b, r.jaccard)
            for r in compaction.read_epoch_sink(
                spark, pairs_root
            ).collect()
        }
        want = {
            (r.id_a, r.id_b, r.jaccard)
            for r in dedup.incremental_near_dup_pairs(
                index, batch_all, "doc_id", "text"
            ).collect()
        }
        assert got == want
        assert len(want) > 0
        # cross-wave evidence: the planted duplicate's pair joins a
        # wave-1 id to a wave-2 id — only reachable through the
        # compacted index rows (wave-1's batch=* dirs were GC'd)
        assert any(
            {a, b} == {victim.doc_id, planted_id} for a, b, _ in got
        )
    finally:
        index.unpersist()


def test_compaction_is_incremental_and_idempotent(spark, tmp_path):
    """A second compact with nothing new returns the same bound and
    changes nothing a reader sees; new epochs after a compaction fold
    ON TOP of it (the previous compacted dir is an input, covered
    epochs are not re-read from their dirs)."""
    root = str(tmp_path / "sink")
    for epoch in range(4):
        spark.range(epoch * 10, epoch * 10 + 10).write.parquet(
            f"{root}/batch={epoch}"
        )
    bound = compaction.compact_epoch_sink(spark, root)
    assert bound == 2  # keep_last=1 leaves batch=3 alone
    before = {r.id for r in compaction.read_epoch_sink(spark, root).collect()}
    assert before == set(range(40))
    assert compaction.compact_epoch_sink(spark, root) == 2  # no-op
    assert {
        r.id for r in compaction.read_epoch_sink(spark, root).collect()
    } == before

    compaction.gc_epoch_sink(spark, root)
    for epoch in (4, 5):
        spark.range(epoch * 10, epoch * 10 + 10).write.parquet(
            f"{root}/batch={epoch}"
        )
    assert compaction.compact_epoch_sink(spark, root) == 4
    compaction.gc_epoch_sink(spark, root)
    assert {
        r.id for r in compaction.read_epoch_sink(spark, root).collect()
    } == set(range(60))
    # exactly one committed compaction + the keep_last epoch remain
    assert _epoch_dir_names(root) == ["batch=5"]
    assert sorted(os.listdir(os.path.join(root, "_compacted"))) == [
        "upto=4"
    ]


def test_partial_compaction_invisible(spark, tmp_path):
    """A killed compactor's directory (no _SUCCESS) must be ignored by
    readers and by GC — the sink keeps serving from the epoch dirs."""
    root = str(tmp_path / "sink")
    for epoch in range(3):
        spark.range(epoch * 5, epoch * 5 + 5).write.parquet(
            f"{root}/batch={epoch}"
        )
    partial = os.path.join(root, "_compacted", "upto=1")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-00000.parquet"), "wb") as f:
        f.write(b"not parquet")  # a read would crash; it must be skipped
    assert {
        r.id for r in compaction.read_epoch_sink(spark, root).collect()
    } == set(range(15))
    assert compaction.gc_epoch_sink(spark, root) == []
    assert _epoch_dir_names(root) == ["batch=0", "batch=1", "batch=2"]


def test_quiescence_violation_refused(spark, tmp_path):
    """A compaction covering an epoch a live stream still needs
    excluded (strictly-earlier probe contract) is unrecoverable mixing
    — the probe-view helper must refuse, not silently union the
    stream's own rows into its probe."""
    import pytest

    root = str(tmp_path / "sink")
    for epoch in range(3):
        spark.range(5).write.parquet(f"{root}/batch={epoch}")
    compaction.compact_epoch_sink(spark, root)  # covers epochs <= 1
    with pytest.raises(ValueError, match="quiescence"):
        compaction.epoch_sink_paths(spark, root, before=1)
    # an epoch bound ABOVE the compaction is fine
    assert compaction.epoch_sink_paths(spark, root, before=2)


def test_keep_last_zero_refused(spark, tmp_path):
    import pytest

    root = str(tmp_path / "sink")
    spark.range(5).write.parquet(f"{root}/batch=0")
    with pytest.raises(ValueError, match="keep_last"):
        compaction.compact_epoch_sink(spark, root, keep_last=0)


def test_keep_last_beyond_epoch_count_compacts_nothing(spark, tmp_path):
    """keep_last larger than the epoch count must protect EVERY epoch
    (r7 advice): the old negative-index slice ``epochs[:len-keep]``
    silently selected the first ``2*len - keep`` epochs, compacting
    inside the caller's requested keep window — an operator whose
    deployment can replay deeper would then see a replayed epoch
    rewritten beside a compaction that already covers it."""
    root = str(tmp_path / "sink")
    for e in range(7):
        spark.range(e * 10, e * 10 + 10).write.parquet(
            f"{root}/batch={e}"
        )
    # old bug: keep_last=10 > 7 epochs selected epochs 0-3 for folding
    assert compaction.compact_epoch_sink(spark, root, keep_last=10) is None
    assert not os.path.isdir(os.path.join(root, "_compacted"))
    assert _epoch_dir_names(root) == [f"batch={e}" for e in range(7)]
    # boundary: keep_last == epoch count still compacts nothing
    assert compaction.compact_epoch_sink(spark, root, keep_last=7) is None
    # and one fewer protects exactly the newest six
    bound = compaction.compact_epoch_sink(spark, root, keep_last=6)
    assert bound == 0


def test_compaction_reduces_file_count(spark, tmp_path):
    """The point of the exercise, pinned: many tiny per-epoch files
    fold into a handful (128 MB target => 1 file at fixture scale)."""
    root = str(tmp_path / "sink")
    for epoch in range(6):
        spark.range(epoch * 10, epoch * 10 + 10).repartition(3).write.parquet(
            f"{root}/batch={epoch}"
        )

    def parquet_files(d):
        return [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        ]

    n_before = len(parquet_files(root))
    assert n_before >= 15
    compaction.compact_epoch_sink(spark, root)
    compaction.gc_epoch_sink(spark, root)
    assert len(parquet_files(root)) <= 4  # 1 compacted + keep_last epoch


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# A maintenance SCHEDULE: for each epoch, whether to run compact (and
# optionally gc) after sinking it. Bounded small — each example builds
# real parquet dirs.
_schedules = st.lists(
    st.tuples(st.booleans(), st.booleans()), min_size=2, max_size=6
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(schedule=_schedules)
def test_any_maintenance_schedule_preserves_reads(
    spark, tmp_path_factory, schedule
):
    """Compaction/GC interleaved ANYWHERE between epoch writes must
    never change the sink's relation: read_epoch_sink == the union of
    every row ever sunk, under every schedule hypothesis draws."""
    root = str(tmp_path_factory.mktemp("sched") / "sink")
    expected: set[int] = set()
    for epoch, (do_compact, do_gc) in enumerate(schedule):
        spark.range(epoch * 100, epoch * 100 + 7).write.parquet(
            f"{root}/batch={epoch}"
        )
        expected |= set(range(epoch * 100, epoch * 100 + 7))
        if do_compact:
            compaction.compact_epoch_sink(spark, root)
            if do_gc:
                compaction.gc_epoch_sink(spark, root)
        got = {
            r.id
            for r in compaction.read_epoch_sink(spark, root).collect()
        }
        assert got == expected
