"""ANN index persistence: train once, search many runs.

The IVF cell table (``operators/clustering.kmeans_cells`` output —
long-form (cell, dim, n_vecs, c_val)) is driver-trained per session
today; at 100 TB training is a scheduled job and searches are many
later jobs, so the index must live on storage between them. This is
that seam: the centroid relation round-trips through parquet with a
schema/version guard, and the loader hands back exactly the wide
centroid list ``topk_ivf(centroids=…)`` inlines.

Bounded by construction — an IVF index is k cells × dim doubles (plus
cell sizes), KBs at any corpus scale — so the loader's collect is not a
data-path collect. The same pattern extends to any trained artifact
the engine grows (quantizer codebooks, LSH projections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INDEX_FORMAT_VERSION = 1


def save_centroids(cells: DataFrame, path: str) -> None:
    """Persist a trained centroid relation as a single-file parquet
    index (k × dim rows — coalesce(1) is correct here: this is bounded
    metadata, not data)."""
    (
        cells.select(
            F.lit(INDEX_FORMAT_VERSION).alias("format_version"),
            F.col("cell").cast("int").alias("cell"),
            F.col("dim").cast("int").alias("dim"),
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.col("c_val").cast("double").alias("c_val"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path)
    )


def load_centroid_cells(spark: SparkSession, path: str) -> DataFrame:
    """Reload the persisted cell relation, verifying the format
    version — an index written by a future incompatible trainer must
    fail loudly, not search with misread centroids."""
    cells = spark.read.parquet(path)
    versions = [
        r["format_version"]
        for r in cells.select("format_version").distinct().collect()
    ]
    if versions != [INDEX_FORMAT_VERSION]:
        raise ValueError(
            f"centroid index at {path} has format_version {versions}, "
            f"expected [{INDEX_FORMAT_VERSION}]"
        )
    return cells.select("cell", "dim", "n_vecs", "c_val")


def save_minhash_index(index: DataFrame, path: str) -> None:
    """Persist a :func:`operators.dedup.minhash_index` relation,
    partitioned by band (probe joins shuffle on (band, key), so at-rest
    band partitioning lets a probe read only matching bands). This IS
    data-sized (corpus × B rows) — sharded write, never coalesced.

    Every row carries the MINHASH SCHEME FINGERPRINT
    (:func:`operators.dedup.minhash_scheme_fingerprint` — shingle
    width, signature length, band geometry, hash family): band keys
    are meaningless outside the scheme that hashed them, and a
    cross-session probe under retuned constants would silently miss
    every stored near-duplicate. The loader compares fingerprints and
    refuses — the MinHash twin of the embedding store's
    ``centroid_fp`` guard."""
    from genai_batch_processor_spark.operators import dedup

    id_type = dict(index.dtypes).get("id")
    if id_type not in ("bigint", "int", "smallint", "tinyint"):
        # cast('long') would silently NULL every non-numeric id and
        # the corrupt index would pass the version guard — refuse
        raise ValueError(
            f"minhash index id column must be integral, got {id_type}; "
            "re-key string ids (e.g. assign_ids) before persisting"
        )
    (
        index.select(
            F.lit(INDEX_FORMAT_VERSION).alias("format_version"),
            F.lit(dedup.minhash_scheme_fingerprint()).alias("scheme_fp"),
            F.col("band").cast("int").alias("band"),
            F.col("key").cast("long").alias("key"),
            F.col("id").cast("long").alias("id"),
            F.col("hs"),
            F.col("bucket_n").cast("long").alias("bucket_n"),
        )
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(path)
    )


def load_minhash_index(
    spark: SparkSession, path: str, check_bucket_counts: bool = True
) -> DataFrame:
    """Reload a persisted MinHash band index with the same version
    guard as the centroid store. The distinct runs BEFORE the limit so
    a mixed-version directory (e.g. a partial overwrite leaving old
    files beside new) cannot hide behind two same-version sample rows;
    the scan reads one small column, not the payload.

    ``check_bucket_counts`` is the staleness guard: after a takedown
    deletes rows, the denormalized ``bucket_n`` on surviving rows
    still counts the removed members and silently over-applies the
    probe-time bucket cap — :func:`operators.dedup.with_bucket_counts`
    is the documented repair, but docs don't stop an operator from
    loading a stale index. The guard spot-checks ONE band (partition-
    pruned, two small columns, no ``hs`` payload): recorded
    ``bucket_n`` vs actual per-key row count, and raises naming the
    repair. Every band gets the same delete (a doc's rows span all
    bands), so one band's counts witness the whole index."""
    from genai_batch_processor_spark.operators import dedup

    idx = spark.read.parquet(path)
    versions = [
        r["format_version"]
        for r in idx.select("format_version").distinct().limit(3).collect()
    ]
    if versions != [INDEX_FORMAT_VERSION]:
        raise ValueError(
            f"minhash index at {path} has format_version {versions}, "
            f"expected [{INDEX_FORMAT_VERSION}]"
        )
    want_fp = dedup.minhash_scheme_fingerprint()
    if "scheme_fp" not in idx.columns:
        raise ValueError(
            f"minhash index at {path} carries no scheme_fp column — it "
            "was written before the scheme-fingerprint guard and its "
            "band keys cannot be verified against the current MinHash "
            "constants; rebuild with operators.dedup.minhash_index and "
            "re-save"
        )
    fps = [
        r["scheme_fp"]
        for r in idx.select("scheme_fp").distinct().limit(3).collect()
    ]
    if fps != [want_fp]:
        raise ValueError(
            f"minhash index at {path} was built under MinHash scheme "
            f"{[f[:12] for f in fps]} but this build hashes with "
            f"{want_fp[:12]} — band keys are not comparable across "
            "schemes (shingle width / signature length / band geometry "
            "/ hash family changed). Rebuild with "
            "operators.dedup.minhash_index and re-save."
        )
    out = idx.select("band", "key", "id", "hs", "bucket_n")
    if check_bucket_counts:
        first = idx.select("band").limit(1).collect()
        if first:
            band_val = first[0]["band"]
            # Per key, compare the bucket's TOTAL row count against its
            # (single) recorded bucket_n — the same total-vs-recorded
            # compare the embedding loader runs. Grouping BY bucket_n
            # would let concatenated index GENERATIONS pass: each
            # generation's rows internally consistent with their own
            # bucket_n while every recorded count lies about the actual
            # bucket population.
            stale = (
                out.filter(F.col("band") == band_val)
                .groupBy("key")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("actual_n"),
                    F.collect_set("bucket_n").alias("recorded"),
                )
                .filter(
                    (F.size("recorded") != 1)
                    | (F.element_at("recorded", 1) != F.col("actual_n"))
                )
                .limit(1)
                .collect()
            )
            if stale:
                r = stale[0]
                raise ValueError(
                    f"minhash index at {path} is STALE: band {band_val} "
                    f"key {r['key']} records "
                    f"bucket_n={sorted(r['recorded'])} but holds "
                    f"{r['actual_n']} rows — rows were erased or index "
                    "generations concatenated without refreshing counts; "
                    "rebuild with operators.dedup.with_bucket_counts and "
                    "re-save"
                )
    return out


def save_embedding_index(
    index: DataFrame,
    centroids: list[tuple[int, list[float]]],
    path: str,
) -> None:
    """Persist an :func:`operators.similarity.embedding_cell_index`
    relation, partitioned by cell (probes join on ``cell``, so at-rest
    cell partitioning lets a probe read only the batch's cells). This
    IS data-sized (one row per corpus vector) — sharded write, never
    coalesced.

    Alongside ``format_version``, every row carries the CONTENT
    FINGERPRINT of the centroid set the cells were assigned under
    (:func:`operators.similarity.centroid_fingerprint`):
    cell ids are meaningless outside their centroid set, and a
    cross-session probe against RE-TRAINED (different) centroids would
    silently assign the batch to incompatible cells — the loader
    compares fingerprints and refuses (round-6 verdict item 2, the
    guard the MinHash index already had via ``bucket_n``)."""
    from genai_batch_processor_spark.operators import similarity

    id_type = dict(index.dtypes).get("vec_id")
    if id_type not in ("bigint", "int", "smallint", "tinyint"):
        # same refusal as the MinHash store: cast('long') would
        # silently NULL non-numeric ids past the version guard
        raise ValueError(
            f"embedding index vec_id column must be integral, got "
            f"{id_type}; re-key string ids (e.g. assign_ids) before "
            "persisting"
        )
    fp = similarity.centroid_fingerprint(centroids)
    (
        index.select(
            F.lit(INDEX_FORMAT_VERSION).alias("format_version"),
            F.lit(fp).alias("centroid_fp"),
            F.col("cell").cast("int").alias("cell"),
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("embedding"),
            F.col("nrm").cast("double").alias("nrm"),
            F.col("cell_n").cast("long").alias("cell_n"),
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )


def load_embedding_index(
    spark: SparkSession,
    path: str,
    centroids: list[tuple[int, list[float]]],
    check_cell_counts: bool = True,
) -> DataFrame:
    """Reload a persisted embedding cell index for probing with
    ``centroids`` — refusing, loudly, the two silent-corruption paths:

    1. **Centroid mismatch**: the caller's centroid set is
       fingerprinted and compared against the fingerprint stored at
       build time. A mismatch (re-trained centroids, different k, a
       different corpus's index at the same path) raises naming the
       repair: either load the centroid set the index was built with
       (:func:`load_centroids` from its companion store) or rebuild
       the index under the current set
       (``similarity.embedding_cell_index``). Without this guard the
       probe would join on incompatible cell ids and return silently
       wrong (mostly-empty) pair sets.
    2. **Stale ``cell_n``** after a takedown erased rows: spot-checks
       ONE cell (partition-pruned, two small columns, no embedding
       payload) — recorded ``cell_n`` vs actual row count — and raises
       naming ``similarity.with_cell_counts`` as the repair. Every
       cell gets takedowns independently here (a vector lives in ONE
       cell, unlike MinHash rows spanning all bands), so the witness
       is the cell most recently read, not the whole index — cheap
       tripwire, not a proof; the probe path's row-count cap stays
       correct either way.

    Version guard mirrors the MinHash loader: distinct BEFORE limit so
    a mixed-version directory cannot hide behind same-version samples."""
    from genai_batch_processor_spark.operators import similarity

    idx = spark.read.parquet(path)
    versions = [
        r["format_version"]
        for r in idx.select("format_version").distinct().limit(3).collect()
    ]
    if versions != [INDEX_FORMAT_VERSION]:
        raise ValueError(
            f"embedding index at {path} has format_version {versions}, "
            f"expected [{INDEX_FORMAT_VERSION}]"
        )
    fps = [
        r["centroid_fp"]
        for r in idx.select("centroid_fp").distinct().limit(3).collect()
    ]
    want = similarity.centroid_fingerprint(centroids)
    if fps != [want]:
        raise ValueError(
            f"embedding index at {path} was built under centroid set "
            f"{[f[:12] for f in fps]} but the caller holds {want[:12]} — "
            "cell ids are not comparable across centroid sets. Load the "
            "build-time centroids (sources.index_store.load_centroids "
            "from the index's companion centroid store) or rebuild the "
            "index with operators.similarity.embedding_cell_index under "
            "the current set."
        )
    out = idx.select("cell", "vec_id", "embedding", "nrm", "cell_n")
    if check_cell_counts:
        first = idx.select("cell").limit(1).collect()
        if first:
            cell_val = first[0]["cell"]
            # Compare the cell's TOTAL row count against its (single)
            # recorded cell_n. Grouping BY cell_n would let a
            # concatenation of index generations pass — each
            # generation's rows internally consistent with their own
            # cell_n while every recorded count lies about the actual
            # cell population.
            probe = (
                out.filter(F.col("cell") == cell_val)
                .agg(
                    F.count(F.lit(1)).cast("long").alias("actual_n"),
                    F.collect_set("cell_n").alias("recorded"),
                )
                .collect()[0]
            )
            recorded = sorted(probe["recorded"])
            if recorded != [probe["actual_n"]]:
                raise ValueError(
                    f"embedding index at {path} is STALE: cell "
                    f"{cell_val} records cell_n={recorded} but holds "
                    f"{probe['actual_n']} rows — rows were erased or "
                    "index generations concatenated without refreshing "
                    "counts; rebuild with "
                    "operators.similarity.with_cell_counts and re-save"
                )
    return out


def load_centroids(
    spark: SparkSession, path: str
) -> list[tuple[int, list[float]]]:
    """Index → the wide centroid list the IVF search path inlines."""
    from genai_batch_processor_spark.operators import clustering

    return clustering.centroids_from_cells(
        load_centroid_cells(spark, path)
    )


def _span_scheme_fingerprint(spark: SparkSession, span_words: int) -> str:
    """Content hash of the span-index scheme: the span width plus TWO
    CANARIES — the 60-bit hash of a fixed string computed by the live
    hash function, and the actual span array the live shingling
    (``text.shingles`` at ``span_words``, post-lower) produces for a
    fixed sentence. Hashing canary outputs (rather than naming the
    algorithms) means ANY change to the hash OR the
    word-splitting/span-assembly implementation changes the
    fingerprint, not just changes someone remembered to version. One
    1-row job; bounded like the loaders' other probes."""
    import hashlib

    from genai_batch_processor_spark.functions import hashing
    from genai_batch_processor_spark.functions import text as tx

    row = (
        spark.range(1)
        .select(
            hashing.portable_hash60(
                F.lower(F.lit("__Span Scheme Canary__"))
            ).alias("h"),
            tx.shingles(
                F.lower(
                    F.lit(
                        "Span Scheme Canary the quick brown fox "
                        "jumps over the lazy dog"
                    )
                ),
                span_words,
            ).alias("spans"),
        )
        .collect()[0]
    )
    payload = f"{span_words}:{row['h']}:" + "|".join(row["spans"])
    return hashlib.sha256(payload.encode()).hexdigest()


def save_span_index(
    index: DataFrame, path: str, span_words: int
) -> None:
    """Persist an :func:`operators.curation.span_index` relation — the
    exact-containment corpus index a later ingest probes. Data-sized
    (one row per distinct corpus span hash): sharded write, never
    coalesced. Every row carries the SPAN SCHEME FINGERPRINT
    (span width + a live hash canary): span hashes are meaningless
    under a different width or hash function, and a probe against a
    mismatched index silently under-reports containment (a known span
    that hashes differently looks novel). ``span_words`` must be the
    width the index was BUILT with."""
    spark = index.sparkSession
    fp = _span_scheme_fingerprint(spark, span_words)
    (
        index.select(
            F.lit(INDEX_FORMAT_VERSION).alias("format_version"),
            F.lit(fp).alias("scheme_fp"),
            F.col("h").cast("long").alias("h"),
        )
        .write.mode("overwrite")
        .parquet(path)
    )


def load_span_index(
    spark: SparkSession, path: str, span_words: int
) -> DataFrame:
    """Reload a persisted span index for probing at ``span_words`` —
    version guard (distinct BEFORE limit, as the other loaders) plus
    the scheme-fingerprint compare: a width or hash-function mismatch
    raises naming the repair instead of silently reporting every known
    span as novel."""
    idx = spark.read.parquet(path)
    versions = [
        r["format_version"]
        for r in idx.select("format_version").distinct().limit(3).collect()
    ]
    if versions != [INDEX_FORMAT_VERSION]:
        raise ValueError(
            f"span index at {path} has format_version {versions}, "
            f"expected [{INDEX_FORMAT_VERSION}]"
        )
    want = _span_scheme_fingerprint(spark, span_words)
    fps = [
        r["scheme_fp"]
        for r in idx.select("scheme_fp").distinct().limit(3).collect()
    ]
    if fps != [want]:
        raise ValueError(
            f"span index at {path} was built under span scheme "
            f"{[f[:12] for f in fps]} but this probe computes "
            f"{want[:12]} — the span width or the hash function "
            "changed; rebuild with operators.curation.span_index at "
            "the probe's span_words and re-save"
        )
    return idx.select("h")
