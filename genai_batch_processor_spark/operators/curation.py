"""Corpus-curation operators: span-level exact-dup statistics, DSIR
importance weights, sequential filter funnels, reciprocal-rank fusion.

These are the composable forms behind the ``span_dedup_stats`` /
``dsir_weights`` / ``quality_filter_funnel`` / ``rrf_fusion`` queries —
parameterized on columns and thresholds so a pipeline (see
``examples/run_curation_pipeline.py``) can apply them to any corpus
relation, not just the fixture tables. No reference analog: the
reference (``openai_batch_processor.py``, 328 LoC) stops at batch
inference; these decide WHAT to send and keep.

All outputs are integer-unit (ppm / milli-nat / micro) so downstream
decisions are engine- and partitioning-independent.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from genai_batch_processor_spark.functions import hashing
from genai_batch_processor_spark.functions.fanout import fan_out
from genai_batch_processor_spark.functions import text as tx

SPAN_WORDS_DEFAULT = 5
DSIR_BUCKETS_DEFAULT = 256
RRF_K_DEFAULT = 60


def span_dup_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = SPAN_WORDS_DEFAULT,
) -> DataFrame:
    """Per-document exact duplicated-span statistics (Lee et al.
    substring dedup, reformulated over fixed-width word spans): a span
    is duplicated when its window occurs in >= 2 distinct documents.
    Output: (id, n_spans, n_dup_spans, dup_ppm).

    Scale: one corpus explode -> 60-bit span hashes; doc-frequency is
    a single count_distinct hash aggregate; the duplicated-hash set is
    aggregate-sized and joins back on the hash key (broadcast under
    AQE when small, sort-merge otherwise) — never a corpus self-join.
    """
    # Parallelism floor before the span hashing (functions/fanout.py):
    # the explode + 60-bit hashing is the expensive narrow stage and a
    # single-split local scan runs it serially (profiled: two 1.0-1.3 s
    # single-task branches at sf0.1). No-op at real scale.
    spans = fan_out(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("__id"),
        F.explode(tx.shingles(F.lower(F.col(text_col)), span_words)).alias(
            "span"
        ),
    ).select("__id", hashing.portable_hash60("span").alias("h"))
    docfreq = spans.groupBy("h").agg(
        F.count_distinct("__id").alias("ndocs")
    )
    dup = docfreq.filter(F.col("ndocs") >= 2).select(
        "h", F.lit(True).alias("dup")
    )
    return (
        spans.join(dup, "h", "left")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.when(F.col("dup"), 1).otherwise(0))
            .cast("long")
            .alias("n_dup_spans"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_spans",
            "n_dup_spans",
            F.expr("n_dup_spans * 1000000 div n_spans").alias("dup_ppm"),
        )
    )


def span_index(
    docs: DataFrame,
    text_col: str = "text",
    span_words: int = SPAN_WORDS_DEFAULT,
) -> DataFrame:
    """Distinct span-hash relation of a corpus — the persisted
    exact-containment index a later ingest probes (the span analog of
    dedup.minhash_index). One row per distinct 60-bit span hash; at
    rest this is hash-bucketed parquet, and probes join on the hash
    key without ever re-shingling the indexed corpus."""
    return (
        docs.select(
            F.explode(
                tx.shingles(F.lower(F.col(text_col)), span_words)
            ).alias("span")
        )
        .select(hashing.portable_hash60("span").alias("h"))
        .distinct()
    )


def probe_span_index(
    index: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = SPAN_WORDS_DEFAULT,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Corpus-containment screen for an ingest batch: per new document,
    how many of its spans the corpus has already seen — the
    boilerplate / plagiarism / contamination signal at ingest time,
    BEFORE the batch is admitted. Output: (id, n_spans, n_known_spans,
    known_ppm), integer ppm.

    Scale: only the (small) batch is exploded, and the batch side
    BROADCASTS into one scan of the index (an inner join can broadcast
    either side; a spans-LEFT-JOIN-index shape could only broadcast
    the index — the corpus-sized side — and would shuffle the index
    on every ingest). The total span count comes from the batch alone,
    so the index is scanned once and never shuffled — the same
    batch-broadcast-into-index-scan design as the incremental MinHash
    probe.

    ``broadcast_batch`` is the guard on that 'small batch' assumption:
    the broadcast side is the EXPLODED batch (docs × spans rows, must
    fit in driver + executor memory, Spark hard-caps broadcasts at
    8 GB). For an ingest batch too large for that — roughly
    > ~10M docs×spans rows — pass False to fall back to a shuffle
    join: the index shuffles once on the span hash, which is the
    correct trade when the 'batch' is itself corpus-sized."""
    spans = new_docs.select(
        F.col(id_col).alias("__id"),
        F.explode(
            tx.shingles(F.lower(F.col(text_col)), span_words)
        ).alias("span"),
    ).select("__id", hashing.portable_hash60("span").alias("h"))
    # Per-doc span totals WITHOUT a second explode+aggregate: the count
    # of exploded spans is just the shingle-array size — one batch
    # scan, no shuffle (second-scan shape flagged in review).
    totals = new_docs.select(
        F.col(id_col).alias("__id"),
        F.size(tx.shingles(F.lower(F.col(text_col)), span_words))
        .cast("long")
        .alias("n_spans"),
    )
    probe_side = F.broadcast(spans) if broadcast_batch else spans
    known = (
        probe_side.join(index.select("h"), "h")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_known_spans"))
    )
    # known is a per-doc aggregate of the (small) batch — broadcast it
    # too, so the whole probe plan is broadcast joins with exactly one
    # pass over the index and one over the batch.
    known_side = F.broadcast(known) if broadcast_batch else known
    return (
        totals.join(known_side, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_spans",
            F.coalesce(F.col("n_known_spans"), F.lit(0))
            .cast("long")
            .alias("n_known_spans"),
        )
        .select(
            id_col,
            "n_spans",
            "n_known_spans",
            F.expr("n_known_spans * 1000000 div n_spans").alias(
                "known_ppm"
            ),
        )
    )


def dsir_weights(
    docs: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS_DEFAULT,
) -> DataFrame:
    """DSIR importance weights (Xie et al.): hashed word-bigram
    features; per-doc weight = sum of ln(p_target/p_raw) over
    Laplace-smoothed bucket models, where ``is_target`` marks the rows
    defining the target distribution. Log-ratios are rounded to
    integer milli-nats per bucket BEFORE the per-doc sum, so the
    resampling order is exact. Output: (id, n_feats, dsir_milli).

    NULL text coalesces to '' (one empty-string feature) so every
    input document appears in the output with a weight — a NULL-hash
    bucket would silently drop the row at the ratios join, turning a
    data-quality issue into a missing id.

    Scale: the bucket model is exactly ``buckets`` rows and the totals
    a 1-row aggregate — both broadcast — so scoring never shuffles the
    corpus-sized feature stream."""
    text = F.coalesce(F.lower(F.col(text_col)), F.lit(""))
    feats = docs.select(
        F.col(id_col).alias("__id"),
        is_target.alias("__tgt"),
        F.explode(tx.shingles(text, 2)).alias("g"),
    ).select(
        "__id",
        "__tgt",
        (hashing.portable_hash32("g") % buckets).alias("b"),
    )
    bucket_counts = feats.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0))
        .cast("long")
        .alias("n_tgt"),
    )
    totals = F.broadcast(
        bucket_counts.agg(
            F.sum("n_raw").cast("long").alias("t_raw"),
            F.sum("n_tgt").cast("long").alias("t_tgt"),
        )
    )
    lr = F.log(
        (F.col("n_tgt") + 1).cast("double") / (F.col("t_tgt") + buckets)
    ) - F.log(
        (F.col("n_raw") + 1).cast("double") / (F.col("t_raw") + buckets)
    )
    ratios = F.broadcast(
        bucket_counts.crossJoin(totals).select(
            "b", F.round(lr * 1000).cast("long").alias("lr_milli")
        )
    )
    return (
        feats.join(ratios, "b")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("lr_milli").cast("long").alias("dsir_milli"),
        )
        .withColumnRenamed("__id", id_col)
    )


def filter_funnel(
    docs: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Sequential filter attrition report: for boolean ``rules``
    applied in order, how many rows pass rules 1..k. Output rows:
    (stage int, rule string, n_pass long), stage 0 = unfiltered total.

    State thresholds inside the rule Columns in cross-multiplied
    integer form where exactness matters (see quality_filter_funnel).
    Scale: one scan, a 1-row aggregate of the cumulative conjunctions,
    then a constant |rules|+1-row stack."""
    cum: list[Column] = []
    for _, rule in rules:
        cum.append(rule if not cum else (cum[-1] & rule))
    agg = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        *[
            F.sum(F.when(c, 1).otherwise(0)).cast("long").alias(f"n{i+1}")
            for i, c in enumerate(cum)
        ],
    )
    names = ["all"] + [name for name, _ in rules]
    # Literal Columns, not a stack() SQL string: rule names are
    # caller-supplied, and interpolating them into an F.expr literal
    # would break (or inject) on quotes/metacharacters in a name.
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(name).alias("rule"),
                F.col(f"n{i}").alias("n_pass"),
            )
            for i, name in enumerate(names)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select(
        "r.stage", "r.rule", "r.n_pass"
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k_const: int = RRF_K_DEFAULT,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked retrieval relations, each with
    (query_id, neighbor_id, rank). Contributions are exact integer
    micro units (1000000 div (K + rank)), so the fused order is
    engine- and summation-order-independent. Output: (query_id,
    neighbor_id, n_lists, rrf_micro, fused_rank), optionally truncated
    to ``topk`` per query.

    Scale: inputs are already top-k relations (|queries| x k), so the
    fusion aggregate and window run on candidate-sized data."""
    contrib = F.expr(f"1000000 div ({k_const} + rank)")
    both = reduce(
        DataFrame.unionByName,
        [
            r.select("query_id", "neighbor_id", contrib.alias("c"))
            for r in rankings
        ],
    )
    fused = both.groupBy("query_id", "neighbor_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_lists"),
        F.sum("c").cast("long").alias("rrf_micro"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("neighbor_id").asc()
    )
    out = fused.withColumn(
        "fused_rank", F.row_number().over(w).cast("int")
    )
    if topk is not None:
        out = out.filter(F.col("fused_rank") <= topk)
    return out
