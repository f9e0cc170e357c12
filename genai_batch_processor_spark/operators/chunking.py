"""Document chunking and sequence packing — the context-window ops of a
training-data pipeline.

The reference maps one record to one request (`_create_request`,
openai_batch_processor.py:79-90); real corpora need the 1→many step
first: split each document into word-window chunks (with overlap, so no
context is lost at boundaries), then PACK chunks into fixed-budget
groups so every training sequence is near-full (padding waste is the
dominant token cost at scale). Both are pure column expressions:

- **Chunking** is a JVM ``sequence``+``slice`` transform — the fan-out
  never touches Python and feeds whatever comes next without a shuffle.
- **Packing** assigns each chunk to the bin containing its cumulative
  word offset — a deterministic, contiguous, shuffle-light strategy
  (one window per pack group). Greedy first-fit would pack ~1% tighter
  but needs sequential state; offset packing is the scalable form and
  both engines replay it bit-identically.
- At 100 TB, pack WITHIN a partition key (here: ``source``) — a global
  packing order would serialize; per-source windows parallelize and
  training shards are usually source-striped anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from genai_batch_processor_spark.functions import text as tx

CHUNK_WORDS = 64
CHUNK_OVERLAP = 16
PACK_BUDGET = 512
# Subword-token packing budget: context windows are denominated in BPE
# tokens, not words (fertility > 1 means a 512-WORD bin overflows a
# 512-TOKEN window on exactly the high-fertility documents). The BPE
# twin packs on token_count_bpe(chunk_text) against this budget.
PACK_BUDGET_BPE = 1024


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = CHUNK_WORDS,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Explode each document into overlapping word windows:
    (id, chunk_idx, chunk_text, n_words). Start offsets advance by
    ``chunk_words - overlap``; the final chunk may be short."""
    if not 0 <= overlap < chunk_words:
        raise ValueError("need 0 <= overlap < chunk_words")
    step = chunk_words - overlap
    # let-bind the split-words array (tx._bind): the per-chunk lambda
    # otherwise re-splits the document once per chunk — O(words²/step)
    chunk = F.explode(
        tx._bind(
            tx.words(F.col(text_col)),
            lambda ws: F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size(ws), F.lit(1)), F.lit(step)
                ),
                lambda s, i: F.struct(
                    i.alias("chunk_idx"),
                    F.slice(ws, s, chunk_words).alias("__w"),
                ),
            ),
        )
    )
    out = docs.select(F.col(id_col), chunk.alias("c")).select(
        id_col,
        F.col("c.chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(F.col("c.__w"), " ").alias("chunk_text"),
        F.size(F.col("c.__w")).cast("int").alias("n_words"),
    )
    return out


def sql_chunk_documents(
    id_expr: str = "doc_id",
    text_expr: str = "text",
    chunk_words: int = CHUNK_WORDS,
    overlap: int = CHUNK_OVERLAP,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`chunk_documents` (same offsets, same
    short-final-chunk rule)."""
    step = chunk_words - overlap
    w = tx.sql_words(text_expr)
    return f"""
    SELECT {id_expr},
           CAST(u.i - 1 AS INT) AS chunk_idx,
           array_to_string(
             ({w})[u.s : u.s + {chunk_words - 1}], ' ') AS chunk_text,
           CAST(len(({w})[u.s : u.s + {chunk_words - 1}]) AS INT)
             AS n_words
    FROM {table},
         LATERAL (
           SELECT unnest(generate_series(
                    1, greatest(len({w}), 1), {step})) AS s,
                  generate_subscripts(generate_series(
                    1, greatest(len({w}), 1), {step}), 1) AS i
         ) AS u
    """


def pack_chunks(
    chunks: DataFrame,
    group_col: str,
    order_cols: list[str],
    budget_words: int = PACK_BUDGET,
    n_words_col: str = "n_words",
    packed_col: str = "packed_words",
) -> DataFrame:
    """Assign each chunk to a bin by cumulative size offset within its
    pack group: bin = floor(offset_before_chunk / budget). Returns the
    per-(group, bin) packing relation: chunk count, packed size, fill
    ratio (exact int/int division in double). The size column is any
    integer length — regex words or BPE tokens (``packed_col`` names
    the output accordingly)."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    cum = F.sum(n_words_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = chunks.withColumn(
        "__bin",
        F.floor(
            (cum - F.col(n_words_col)) / F.lit(budget_words)
        ).cast("long"),
    )
    return (
        binned.groupBy(group_col, "__bin")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(n_words_col).cast("long").alias(packed_col),
        )
        .select(
            group_col,
            F.col("__bin").alias("bin"),
            "n_chunks",
            packed_col,
            (
                F.col(packed_col).cast("double")
                / F.lit(float(budget_words))
            ).alias("fill_ratio"),
        )
    )
