"""End-to-end training-data curation over the north-star operator set —
the flow a 100 TB pretraining-data job runs, composed from this repo's
operators (no reference analog: the reference stops at batch
inference; this is the pipeline that decides WHAT to send).

Stages, each a lazy DataFrame transformation until the final actions:

1. NEAR-DUP PRUNE — MinHash-LSH candidate pairs → Jaccard verify →
   connected components → keep one survivor per cluster.
1b. SPAN PRUNE — per-doc exact duplicated-span ppm (the boilerplate
   signal whole-doc MinHash misses); drop documents that are mostly
   spans seen elsewhere in the corpus.
1c. SEMANTIC PRUNE — embedding-cosine near-dup eviction over the
   SURVIVING corpus's embeddings (sign-LSH cells → capped in-cell pairs →
   star components → min-id survivor per semantic cluster): the
   paraphrase signal BOTH text stages miss — reworded copies share no
   shingles and no exact spans but sit on near-identical embeddings.
   The loser set is a small fraction of the corpus and anti-joins in
   (broadcast-sized at any scale); the component relation is one more
   SHARED persisted stage of the one job.
2. QUALITY GATE — native-expression text metrics; drop documents
   below a quality score or outside a length band. A funnel report of
   THESE rules (operators/curation.py:filter_funnel) prints first so
   each rule's attrition is visible before the cut.
3. DECONTAMINATE — drop documents sharing shingles with a benchmark
   set (here: a small probe built from the corpus head, stands in for
   a real eval set; broadcast-sized at any corpus scale).
4. MIXTURE — temperature-flattened source weights (w ∝ n^(1/T)) →
   per-source ppm sampling rates → row-local hash-rate filter,
   composed with DSIR importance weights toward the 'en' slice
   (operators/curation.py:dsir_weights): a document samples in only
   if it clears BOTH the source rate and its importance rank gate.
5. PACK + ORDER — chunk long documents to a context window, assign the
   deterministic (shard, pos) training-consumption order.

Run:  python examples/run_curation_pipeline.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

# allow `python examples/<script>.py` from anywhere: put the repo
# root (the package home) on sys.path before package imports
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from genai_batch_processor_spark.functions import text as tx
from genai_batch_processor_spark.operators import batching, chunking, dedup
from genai_batch_processor_spark.operators import curation, sampling, similarity
from genai_batch_processor_spark.session import get_spark
from genai_batch_processor_spark.sources.tables import load_table

MIN_QUALITY = 0.5          # tx.quality_score is a [0,1] composite
LEN_BAND = (20, 5000)      # words
MAX_DUP_PPM = 600_000      # drop docs that are mostly duplicated spans
DSIR_MIN_MILLI = -1_000    # drop docs strongly off-target (milli-nats)
DSIR_TARGET_LANG = "en"
TEMPERATURE = 2.0
CONTEXT_WORDS = 64
N_SHARDS = 8


def main(spark: SparkSession | None = None, sf_dir: str | None = None):
    spark = spark or get_spark("example-curation")
    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    )
    docs = load_table(spark, sf_dir, "documents")

    # 1. near-dup prune: pairs → components → min-id survivors.
    # Persisted: every later stage (and each returned relation a
    # caller acts on) builds on this subtree — without the persist the
    # MinHash pipeline re-runs per action.
    pairs = dedup.near_dup_pairs(docs, "doc_id", "text")
    comps = dedup.connected_components(pairs)
    # Persisted: the span stage references this subtree three times
    # (twice inside span_dup_stats' two-scan design, once as the
    # anti-join left side) — unpersisted, the whole MinHash pipeline
    # would re-run per reference.
    survivors = dedup.dedup_survivors(docs, comps, "doc_id").persist()

    # 1b. span prune: exact duplicated-span ppm over the surviving
    # corpus — boilerplate that repeats across DISTINCT pages slips
    # whole-doc MinHash but shows up here. The stats relation is
    # per-doc-sized; the anti-join keys on doc_id.
    spans = curation.span_dup_stats(survivors, "doc_id", "text")
    span_pruned = survivors.join(
        spans.filter(F.col("dup_ppm") > MAX_DUP_PPM).select("doc_id"),
        "doc_id",
        "left_anti",
    )

    # 1c. semantic prune: paraphrase eviction on the embedding table
    # (vec_id aligns with doc_id in the fixture corpus; in production
    # the embedding job carries the doc key through). The embedding
    # relation is FIRST restricted to the current survivors — like
    # every stage, this one clusters what is still in the corpus: a
    # semantic cluster whose min-id member was already removed by the
    # text stages must still keep a representative (clustered over the
    # full table, that cluster's survivors would all be classified
    # losers and the content would vanish entirely). Persisted: the
    # component relation feeds the survivor anti-join and is the
    # natural audit relation a production run sinks; the downstream
    # chain references the pruned corpus many times.
    emb = load_table(spark, sf_dir, "embeddings").join(
        span_pruned.select(F.col("doc_id").alias("vec_id")),
        "vec_id",
        "left_semi",
    )
    ecomps = dedup.connected_components_star(
        similarity.embedding_near_dup_pairs(emb)
    ).persist()
    deduped = dedup.dedup_survivors(span_pruned, ecomps, "doc_id").persist()

    # 2. quality gate: native exprs, no Python in the plan
    gated = deduped.withColumn(
        "quality", tx.quality_score("text")
    ).withColumn("n_words", tx.word_count("text")).filter(
        (F.col("quality") >= MIN_QUALITY)
        & F.col("n_words").between(*LEN_BAND)
    )

    # 3. decontaminate against a (stand-in) benchmark probe.
    # Persisted: the mixture planner aggregates it and the sample
    # filter scans it again. (A 5-doc probe broadcasts, so the exact
    # operator is the right plan here; once the eval suite outgrows a
    # broadcast, swap in dedup.bloom_contamination_hits — identical
    # answer, with an adaptively sized bitmap plan-literal dropping
    # ~98% of corpus shingles before the join.)
    bench = docs.orderBy("doc_id").limit(5).select("text")
    hits = dedup.contamination_hits(gated, bench, "doc_id", "text")
    clean = gated.join(
        hits.select("doc_id"), "doc_id", "left_anti"
    ).persist()

    # 4. temperature mixture → ppm rates → row-local filter. The
    # weights relation is |sources| rows — a PLAN, not data — so it is
    # collected once and the per-source rates rebroadcast as literals:
    # zero extra passes over the corpus (weights.n_docs already IS the
    # per-source count, and n_all its sum). A filter can only
    # DOWNSAMPLE, so raw rates are renormalized by the max — the most
    # up-weighted source keeps 100% of its rows and every other source
    # scales relative to it, preserving the target PROPORTIONS on
    # skewed corpora (a plain clamp at 1e6 would flatten exactly the
    # tail sources temperature sampling exists to up-weight).
    w_rows = sampling.temperature_weights(
        clean, "source", temperature=TEMPERATURE
    ).collect()
    n_all = sum(r.n_docs for r in w_rows)
    raw = {r.source: r.weight_ppm * n_all // r.n_docs for r in w_rows}
    top = max(raw.values())
    rates = spark.createDataFrame(
        [(s, v * 1_000_000 // top) for s, v in raw.items()],
        "source string, rate_ppm long",
    )
    # DSIR importance weights toward the target language slice,
    # composed with the source-rate gate: a row samples in only if it
    # clears the per-source rate AND is not strongly off-target. The
    # weight relation is per-doc-sized and joins on doc_id; the bucket
    # model inside dsir_weights is broadcast, so this adds no
    # corpus-wide shuffle beyond the doc_id join.
    dsir = curation.dsir_weights(
        clean, F.col("lang") == DSIR_TARGET_LANG, "doc_id", "text"
    )
    mixed = (
        clean.join(F.broadcast(rates), "source")
        .join(dsir.select("doc_id", "dsir_milli"), "doc_id")
        .filter(
            # hash_coord is already in [0, 1e6) — same scale as rate_ppm
            (
                sampling.hash_coord("doc_id", "curation-mix")
                < F.col("rate_ppm")
            )
            & (F.col("dsir_milli") >= DSIR_MIN_MILLI)
        )
        .drop("dsir_milli", "rate_ppm")
    )

    # 5. context-window chunking + deterministic training order
    chunks = chunking.chunk_documents(
        mixed.select("doc_id", "text"), "doc_id", "text",
        chunk_words=CONTEXT_WORDS,
    )
    ordered = batching.training_order(
        chunks.withColumn(
            "chunk_key",
            F.concat_ws(":", F.col("doc_id"), F.col("chunk_idx")),
        ),
        "chunk_key",
        seed="epoch-0",
        n_shards=N_SHARDS,
    )
    return deduped, clean, mixed, ordered


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else None
    deduped, clean, mixed, ordered = main(sf_dir=sf)
    # attrition report of the ACTUAL stage-2 gate rules, in gate
    # order — which rule is doing the cutting, before the cut
    curation.filter_funnel(
        deduped.select(
            tx.quality_score("text").alias("quality"),
            tx.word_count("text").alias("n_words"),
        ),
        [
            ("quality", F.col("quality") >= MIN_QUALITY),
            ("len_band", F.col("n_words").between(*LEN_BAND)),
        ],
    ).show()
    print(
        f"survivors: {deduped.count()}  post-gate: {clean.count()}  "
        f"sampled: {mixed.count()}  training chunks: {ordered.count()}"
    )
    ordered.groupBy("shard").count().orderBy("shard").show()
