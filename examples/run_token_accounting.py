"""Token-exact corpus accounting, end to end — the workflow a training
-data team runs before spending a budget: train a tokenizer ON the
corpus (as a Spark job), price every document in real subword tokens,
plan a token-budget mixture, pack context windows, and estimate the
provider bill. Extends the reference's whole-item submit model
(``openai_batch_processor.py:127-145``, per-item token budgets in
``examples/openai/run_text_classifier.py:59-60``) with the
token-denominated operators a 100 TB corpus needs.

Every step is a DataFrame transformation; the only Python boundary is
the Arrow-batched BPE encode (``functions/bpe.py``).

Run:  python examples/run_token_accounting.py  [sf_dir]
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

from genai_batch_processor_spark.functions import bpe
from genai_batch_processor_spark.operators import chunking
from genai_batch_processor_spark.sources.tables import load_table

MIX_WEIGHTS = {"web": 4, "books": 3, "news": 2, "forum": 1, "wiki": 2}
TOKEN_BUDGET = 1200


def main(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents")

    # 1. Train a tokenizer on the corpus itself — a Spark job (one
    #    corpus scan, one small job per merge round), not a driver
    #    loop. The committed fixture table (bpe.load_merges()) is what
    #    the oracle-paired queries pin; here we show training live.
    trained = bpe.train_merges_distributed(
        docs, "text", n_merges=bpe.N_MERGES, n_partitions=8
    )

    # 1b. Persist and reload it as a GOVERNED artifact: save_merges
    #     stamps a format version, a content fingerprint, and a live
    #     encode canary; load_merges refuses a corrupted, hand-edited,
    #     or behavior-drifted table LOUDLY — wrong-table counts are
    #     silently wrong everywhere downstream (billing, packing,
    #     mixture rates), so the artifact must prove itself at load.
    import tempfile

    path = os.path.join(tempfile.mkdtemp(), "merges.json")
    bpe.save_merges(trained, path)
    merges = bpe.load_merges(path)  # verifying loader
    assert merges == trained

    # 2. Price every document in real subword tokens (Arrow-batched;
    #    the per-executor memo is keyed by the table's content
    #    fingerprint, so the steady state is one dict probe/word even
    #    for a freshly loaded tokenizer).
    sized = docs.withColumn(
        "n_tokens", bpe.token_count_bpe("text", merges=merges)
    )

    # 3. Per-source accounting: available tokens and compression rate.
    per_source = sized.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("available_tokens"),
        F.expr(
            "sum(octet_length(text)) * 1000 div sum(n_tokens)"
        ).alias("bytes_per_token_milli"),
    )

    # 4. Pack context windows on tokens, not words: chunk each doc,
    #    price each chunk, bin by cumulative token offset per source.
    chunks = chunking.chunk_documents(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    packed = chunking.pack_chunks(
        chunks.withColumn(
            "n_bpe", bpe.token_count_bpe("chunk_text", merges=merges)
        ),
        group_col="source",
        order_cols=["doc_id", "chunk_idx"],
        budget_words=chunking.PACK_BUDGET_BPE,
        n_words_col="n_bpe",
        packed_col="packed_tokens",
    )
    fill = packed.agg(
        F.avg("fill_ratio").alias("avg_fill"),
        F.count(F.lit(1)).alias("n_bins"),
    )

    return per_source, fill


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("token-accounting")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    per_source, fill = main(spark, sf)
    per_source.orderBy("source").show(truncate=False)
    fill.show()
