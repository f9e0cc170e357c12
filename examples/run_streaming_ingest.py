"""Continuous-ingest skeleton: the loop a 100 TB corpus runs FOREVER —
index the corpus once, then screen every arriving batch against it,
durably and restart-safe (no reference analog: the reference stops at
batch inference; this is the admission control in front of it).

The lifecycle, composed from this repo's seams:

1. INDEX — build the corpus MinHash band index once and persist it
   (sources/index_store.save_minhash_index: band-partitioned parquet,
   scheme-fingerprinted so a probe under retuned MinHash constants is
   refused at load instead of silently missing every stored match).
2. STREAM-PROBE — new documents arrive as a file stream; each
   micro-batch probes the loaded index PLUS every earlier epoch's sunk
   band rows (streaming/ingest.near_dup_probe_stream_to_parquet:
   probe-then-extend, per-epoch idempotent parquet, zero driver state,
   `_minhash_fp` marker guarding restarts under a changed scheme).
3. MAINTAIN — between drains, fold the per-epoch directories
   (sources/compaction.compact_epoch_sink + gc_epoch_sink): a
   months-long stream otherwise accumulates one directory and several
   small files per micro-batch; the committed-only read contract means
   a compactor crash at ANY point changes nothing a reader sees.
4. RESUME — a later drain restarts from the same checkpoint and probes
   the COMPACTED coverage + later epochs; cross-wave duplicates are
   still found exactly once.
5. READ — the admission report is the compaction-aware union of the
   pair sink (compaction.read_epoch_sink), joined back to the batch.
6. MERGE — fold the committed index epochs back into the SAVED corpus
   index (sources/index_store.merge_minhash_index): without it a
   months-long ingest accumulates an ever-growing overlay beside a
   stale base; the merge recomputes bucket counts over the union,
   re-stamps the scheme fingerprint, swaps the base in place, marks
   the folded epochs (readers skip them from that moment) and GCs
   them. Later drains reload the merged base and probe it + whatever
   epochs remain.

Run:  python examples/run_streaming_ingest.py  [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from genai_batch_processor_spark.operators import dedup
from genai_batch_processor_spark.session import get_spark
from genai_batch_processor_spark.sources import compaction, index_store
from genai_batch_processor_spark.sources.tables import load_table
from genai_batch_processor_spark.streaming import ingest

NEW_ID_OFFSET = 9_000_000

# set by main(): pairs found for the post-merge wave-3 planted copy —
# the smoke test asserts the merged base actually served the resumed
# stream (>=1), since the example's temp dirs are gone by then
LAST_POST_MERGE_HITS: int | None = None


def main(spark: SparkSession | None = None, sf_dir: str | None = None):
    spark = spark or get_spark("streaming-ingest-example")
    sf_dir = sf_dir or (
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    )
    work = tempfile.mkdtemp(prefix="stream_ingest_")
    index_path = os.path.join(work, "corpus_index")
    shards = os.path.join(work, "arrivals")
    ckpt = os.path.join(work, "ckpt")
    out = os.path.join(work, "probe_out")
    index = None
    try:
        # 1. INDEX: one corpus scan, persisted band-partitioned; the
        # loaded relation is what every later session probes — loading
        # re-checks scheme fingerprint and bucket-count freshness.
        docs = load_table(spark, sf_dir, "documents")
        index_store.save_minhash_index(
            dedup.minhash_index(docs, "doc_id", "text"), index_path
        )
        index = index_store.load_minhash_index(spark, index_path).persist()

        # The 'arriving' batches: re-keyed corpus docs, so every new
        # doc has a known duplicate and the screen has signal. Two
        # waves land as separate files => separate micro-batches.
        new_docs = docs.filter(F.col("doc_id") % 10 == 3).select(
            (F.col("doc_id") + NEW_ID_OFFSET).alias("doc_id"), "text"
        )
        wave1 = new_docs.filter(F.col("doc_id") % 20 == 3)
        # wave 2 carries NOVEL documents too (shuffled-token texts share
        # shingle sets with nothing), so the report shows both classes:
        # near-dup rejections AND clean admissions.
        novel = (
            docs.orderBy("doc_id")
            .limit(5)
            .select(
                (F.col("doc_id") + NEW_ID_OFFSET * 2).alias("doc_id"),
                F.concat_ws(
                    " ", F.reverse(F.split(F.col("text"), " "))
                ).alias("text"),
            )
        )
        wave2 = new_docs.filter(F.col("doc_id") % 20 == 13).unionByName(
            novel
        )

        def drain():
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(shards)
            )
            ingest.near_dup_probe_stream_to_parquet(
                stream, index, "doc_id", "text", out, ckpt
            )

        # 2. STREAM-PROBE wave 1 (several micro-batches).
        wave1.repartition(2).write.mode("append").parquet(shards)
        drain()

        # 3. MAINTAIN while quiescent: fold committed epochs, GC the
        # covered directories. Readers and the restarted stream see
        # the identical relation before and after.
        for root in ("pairs", "index"):
            compaction.compact_epoch_sink(spark, os.path.join(out, root))
            compaction.gc_epoch_sink(spark, os.path.join(out, root))

        # 4. RESUME on wave 2 from the same checkpoint: its probe view
        # is corpus index + compacted wave-1 rows + later epochs.
        wave2.repartition(2).write.mode("append").parquet(shards)
        drain()

        # 5. READ: compaction-aware union of the pair sink => the
        # admission report (per arriving doc: its strongest match).
        pairs = compaction.read_epoch_sink(
            spark, os.path.join(out, "pairs")
        )
        arrived = spark.read.parquet(shards)
        hits = (
            pairs.withColumn(
                "new_id", F.greatest("id_a", "id_b")
            )  # new ids sit above NEW_ID_OFFSET, originals below
            .groupBy("new_id")
            .agg(
                F.count(F.lit(1)).alias("n_matches"),
                F.max("jaccard").alias("best_jaccard"),
            )
        )
        report = arrived.join(
            hits, arrived.doc_id == hits.new_id, "left"
        ).select(
            "doc_id",
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
            "best_jaccard",
            (F.coalesce("best_jaccard", F.lit(0.0)) < 0.9).alias("admit"),
        )
        n_arrived = report.count()
        n_rejected = report.filter(~F.col("admit")).count()
        print(
            f"arrived: {n_arrived}  rejected as near-dup: {n_rejected}  "
            f"admitted: {n_arrived - n_rejected}"
        )
        report = report.localCheckpoint(eager=True)

        # 6. MERGE while quiescent: fold the committed index epochs
        # into the saved base (keep_last protects the newest, possibly
        # replayable, epoch), then reload — the relation every later
        # drain probes. The loader's staleness guard passing is the
        # proof the merged bucket counts are truthful.
        bound = index_store.merge_minhash_index(
            spark, index_path, os.path.join(out, "index")
        )
        index.unpersist()
        index = index_store.load_minhash_index(spark, index_path).persist()
        print(
            f"merged index epochs <= {bound} into the base; merged "
            f"base rows: {index.count()}"
        )

        # 7. POST-MERGE RESUME: wave 3 plants a fresh copy of a wave-1
        # document whose band rows now exist ONLY inside the merged
        # base (its epoch dirs were folded and GC'd) — finding its
        # pair proves the merged base serves resumed streams exactly
        # as the overlay did.
        w1_doc = (
            spark.read.parquet(shards)
            .filter(F.col("doc_id") % 20 == 3)
            .orderBy("doc_id")
            .limit(1)
            .collect()[0]
        )
        wave3_id = w1_doc.doc_id + 3 * NEW_ID_OFFSET
        spark.range(1).select(
            F.lit(wave3_id).alias("doc_id"),
            F.lit(w1_doc.text).alias("text"),
        ).write.mode("append").parquet(shards)
        drain()
        pairs3 = compaction.read_epoch_sink(
            spark, os.path.join(out, "pairs")
        )
        n_hits = pairs3.filter(
            (F.col("id_a") == wave3_id) | (F.col("id_b") == wave3_id)
        ).count()
        global LAST_POST_MERGE_HITS
        LAST_POST_MERGE_HITS = n_hits
        print(
            f"post-merge resume: wave-3 copy {wave3_id} matched "
            f"{n_hits} earlier doc(s) through the merged base"
        )
        return report
    finally:
        if index is not None:
            index.unpersist()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
