"""Continuous ANN-ingest skeleton — the EMBEDDING twin of
run_streaming_ingest.py: train the cell space once, index the corpus
once, then screen every arriving vector batch against it, durably and
restart-safe (semantic admission control in front of training-data
assembly; no reference analog).

What this adds over the MinHash example: the TRAINED state. Cell ids
mean nothing outside the centroid set that assigned them, so the
lifecycle must persist centroids AND cell index together and every
later session must reload both — the centroid fingerprint stamped in
the index (and the `_centroid_fp` marker under the stream's sink root)
refuses a mismatch loudly.

1. TRAIN — k-means cells over the corpus (k corpus-derived), persist
   the centroid relation (sources/index_store.save_centroids: bounded
   k x dim metadata) and the cell index
   (save_embedding_index: data-sized, cell-partitioned,
   centroid-fingerprinted).
2. STREAM-PROBE — vector batches arrive as a file stream; each
   micro-batch probes the loaded index PLUS earlier epochs' sunk cell
   rows (streaming/ingest.embedding_probe_stream_to_parquet:
   probe-then-extend, per-epoch idempotent parquet, zero driver
   state).
3. MAINTAIN — compact + GC both sink roots between drains
   (sources/compaction.py).
4. MERGE — fold committed index epochs back into the saved base
   (index_store.merge_embedding_index: cell counts recomputed over
   the union, fingerprint re-stamped, write-new-then-swap,
   `_merged/upto=K` marker, GC).
5. POST-MERGE RESUME — a later batch plants a copy of an
   already-ingested vector whose cell rows now live only in the
   merged base; its pair must still be found.

Run:  python examples/run_embedding_ingest.py  [sf_dir]
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

from genai_batch_processor_spark.operators import clustering, similarity
from genai_batch_processor_spark.session import get_spark
from genai_batch_processor_spark.sources import compaction, index_store
from genai_batch_processor_spark.sources.tables import load_table
from genai_batch_processor_spark.streaming import ingest

NEW_ID_OFFSET = 9_000_000

# set by main(): post-merge planted-copy matches — the smoke test
# asserts >= 1 after the temp dirs are gone
LAST_POST_MERGE_HITS: int | None = None


def main(spark: SparkSession | None = None, sf_dir: str | None = None):
    global LAST_POST_MERGE_HITS
    spark = spark or get_spark("embedding-ingest-example")
    sf_dir = sf_dir or (
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    )
    work = tempfile.mkdtemp(prefix="emb_ingest_")
    cents_path = os.path.join(work, "centroids")
    index_path = os.path.join(work, "corpus_index")
    shards = os.path.join(work, "arrivals")
    ckpt = os.path.join(work, "ckpt")
    out = os.path.join(work, "probe_out")
    index = None
    try:
        # 1. TRAIN + INDEX, both persisted. A later session reloads
        # centroids FROM THE STORE (never retrains: a retrained set
        # would fingerprint differently and the index loader refuses).
        emb = load_table(spark, sf_dir, "embeddings")
        cells = clustering.kmeans_cells(emb, k=8, iters=3)
        index_store.save_centroids(cells, cents_path)
        cents = index_store.load_centroids(spark, cents_path)
        index_store.save_embedding_index(
            similarity.embedding_cell_index(emb, cents), cents, index_path
        )
        index = index_store.load_embedding_index(
            spark, index_path, cents
        ).persist()

        # Arriving batches: re-keyed corpus vectors (known duplicates
        # => the screen has signal), two waves => two micro-batches.
        new_vecs = emb.filter(F.col("vec_id") % 10 == 3).select(
            (F.col("vec_id") + NEW_ID_OFFSET).alias("vec_id"), "embedding"
        )
        wave1 = new_vecs.filter(F.col("vec_id") % 20 == 3)
        wave2 = new_vecs.filter(F.col("vec_id") % 20 == 13)

        def drain():
            stream = (
                spark.readStream.schema(
                    "vec_id long, embedding array<float>"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(shards)
            )
            ingest.embedding_probe_stream_to_parquet(
                stream, index, cents, out, ckpt
            )

        # 2. STREAM-PROBE wave 1, then 3. MAINTAIN, then wave 2 from
        # the same checkpoint (its probe view = corpus index +
        # compacted wave-1 rows + later epochs).
        wave1.repartition(2).write.mode("append").parquet(shards)
        drain()
        for root in ("pairs", "index"):
            compaction.compact_epoch_sink(spark, os.path.join(out, root))
            compaction.gc_epoch_sink(spark, os.path.join(out, root))
        wave2.repartition(2).write.mode("append").parquet(shards)
        drain()

        pairs = compaction.read_epoch_sink(
            spark, os.path.join(out, "pairs")
        )
        n_arrived = spark.read.parquet(shards).count()
        n_flagged = (
            pairs.select(
                F.greatest("id_a", "id_b").alias("new_id")
            ).distinct().count()
            if pairs is not None
            else 0
        )
        print(
            f"arrived: {n_arrived}  flagged as semantic near-dup: "
            f"{n_flagged}"
        )

        # 4. MERGE while quiescent, reload the merged base.
        bound = index_store.merge_embedding_index(
            spark, index_path, os.path.join(out, "index"), cents
        )
        index.unpersist()
        index = index_store.load_embedding_index(
            spark, index_path, cents
        ).persist()
        print(
            f"merged index epochs <= {bound} into the base; merged "
            f"base rows: {index.count()}"
        )

        # 5. POST-MERGE RESUME: plant a copy of a wave-1 vector whose
        # cell rows now exist only inside the merged base.
        w1_vec = (
            spark.read.parquet(shards)
            .filter(F.col("vec_id") % 20 == 3)
            .orderBy("vec_id")
            .limit(1)
            .collect()[0]
        )
        wave3_id = w1_vec.vec_id + 3 * NEW_ID_OFFSET
        # pure-JVM one-row plan (range+lit), not createDataFrame — a
        # Python-local relation pays a worker spin-up per action (the
        # r7 marker-regression class this repo's BENCH_NOTES documents)
        spark.range(1).select(
            F.lit(wave3_id).alias("vec_id"),
            F.array(
                *[F.lit(float(x)) for x in w1_vec.embedding]
            ).cast("array<float>").alias("embedding"),
        ).coalesce(1).write.mode("append").parquet(shards)
        drain()
        pairs3 = compaction.read_epoch_sink(
            spark, os.path.join(out, "pairs")
        )
        n_hits = pairs3.filter(
            (F.col("id_a") == wave3_id) | (F.col("id_b") == wave3_id)
        ).count()
        LAST_POST_MERGE_HITS = n_hits
        print(
            f"post-merge resume: wave-3 copy {wave3_id} matched "
            f"{n_hits} earlier vector(s) through the merged base"
        )
        return (
            pairs3.select("id_a", "id_b", "cosine")
            .localCheckpoint(eager=True)
        )
    finally:
        if index is not None:
            index.unpersist()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
