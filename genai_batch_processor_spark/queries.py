"""Named queries over the fixture tables — one per implemented operator
family (SURVEY.md §2), each paired with a DuckDB oracle in
``oracles.py``. ``__spark_entry__.py`` re-exports both for the driver.

Query callables take ``(spark, sf_dir)`` and return a DataFrame with
stable, flat, explicitly-aliased column names (driver hash-compares
against the oracle after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from genai_batch_processor_spark.functions import hashing, ids, text as tx
from genai_batch_processor_spark.inference import mock
from genai_batch_processor_spark.operators import (
    dedup,
    joinback,
    requests,
    responses,
    similarity,
)
from genai_batch_processor_spark.sources import schemas
from genai_batch_processor_spark.sources.tables import load_table

ANN_N_QUERIES = 8  # query-set size for the similarity-search fixtures

LABELS = mock.DEFAULT_LABELS


def _documents_with_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ids.assign_ids(docs, "doc_id")


def _request_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → ids → prompt → typed request struct (#3-#6, #33-34)."""
    docs = _documents_with_ids(spark, sf_dir)
    prompt = requests.classification_prompt("text", LABELS)
    docs = docs.withColumn("prompt", prompt)
    content = F.array(requests.text_part(F.col("prompt")))
    return requests.build_openai_requests(
        docs, id_col="idx", user_content=content
    )


def _response_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full wire round-trip: request → JSONL → mock respond → JSONL →
    typed parse (#8, #12, mock boundary). JSON serialization happens both
    directions so the scan/encode operators are genuinely exercised."""
    reqs = _request_pipeline(spark, sf_dir)
    line = F.to_json(F.col("request")).alias("request_line")
    reqs = reqs.withColumn("request_line", line)
    # wire: parse the line back (as the provider would) and mock-respond
    parsed = F.from_json(F.col("request_line"), schemas.OPENAI_REQUEST)
    wire_prompt = F.element_at(
        F.element_at(parsed["body"]["messages"], -1)["content"], -1
    )["text"]
    resp_struct = mock.mock_response_columns(parsed["custom_id"], wire_prompt)
    reqs = reqs.withColumn("response_line", F.to_json(resp_struct))
    return reqs.withColumn(
        "resp", responses.parse_response_json("response_line")
    )


# -- lifecycle queries -------------------------------------------------------


def q_assign_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#4 row enumeration + #5 key synthesis."""
    docs = _documents_with_ids(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.col("idx").cast("long").alias("idx"),
        ids.custom_id("idx").alias("custom_id"),
    )


def q_build_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#3/#33/#34 request projection, flattened to scalars for checking."""
    reqs = _request_pipeline(spark, sf_dir)
    return reqs.select(
        "doc_id",
        F.col("request.custom_id").alias("custom_id"),
        F.col("request.method").alias("method"),
        F.col("request.url").alias("url"),
        F.col("request.body.model").alias("model"),
        F.col("request.body.max_tokens").alias("max_tokens"),
        F.col("request.body.temperature").alias("temperature"),
        F.col("request.body.response_format.type").alias("response_format"),
        F.size(F.col("request.body.messages")).alias("n_messages"),
        F.element_at(
            F.element_at(F.col("request.body.messages"), -1)["content"], -1
        )["text"].alias("prompt"),
    )


def q_azure_model_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#6 conditional column rewrite (Azure deployment overrides model)."""
    docs = _documents_with_ids(spark, sf_dir)
    content = F.array(requests.text_part(F.col("text")))
    reqs = requests.build_openai_requests(
        docs, id_col="idx", user_content=content, azure_deployment="my-deploy"
    )
    return reqs.select(
        "doc_id", F.col("request.body.model").alias("model")
    )


def q_mock_responses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#12 result scan + #38 status branch + #39/#45 extraction."""
    piped = _response_pipeline(spark, sf_dir)
    return piped.select(
        F.col("resp.custom_id").alias("custom_id"),
        responses.status_branch(F.col("resp")).alias("status"),
        responses.extract_content(F.col("resp")).alias("content"),
    )


def q_extract_answer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#40 structured-answer parse out of forced-JSON content."""
    piped = _response_pipeline(spark, sf_dir)
    return piped.select(
        "doc_id",
        responses.extract_answer(
            responses.extract_content(F.col("resp"))
        ).alias("answer"),
    )


def q_error_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#13 error-relation split → per-relation counts."""
    piped = _response_pipeline(spark, sf_dir)
    results, errors = responses.split_errors(piped, "resp")
    return results.select(F.lit("results").alias("relation")).union(
        errors.select(F.lit("errors").alias("relation"))
    ).groupBy("relation").agg(F.count("*").alias("n")).orderBy("relation")


def q_joinback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#35/#36 key-ordered join-back of answers onto inputs."""
    piped = _response_pipeline(spark, sf_dir)
    inputs = piped.select("idx", "doc_id", "lang")
    resps = piped.select(
        F.col("resp.custom_id").alias("custom_id"),
        responses.extract_answer(
            responses.extract_content(F.col("resp"))
        ).alias("answer"),
        responses.status_branch(F.col("resp")).alias("status"),
    )
    joined = joinback.attach_results(inputs, resps, id_col="idx")
    return joined.select("doc_id", "lang", "status", "answer")


def q_label_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#47 aggregates: label × lang distribution of mock answers."""
    joined = q_joinback(spark, sf_dir)
    return (
        joined.filter(F.col("status") == "ok")
        .groupBy("lang", "answer")
        .agg(F.count("*").alias("n"))
    )


def q_vertex_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#19/#21 vertex request + envelope, flattened."""
    docs = _documents_with_ids(spark, sf_dir)
    reqs = requests.build_vertex_requests(
        docs, user_text=F.col("text"), max_output_tokens=50
    )
    env = requests.vertex_envelope(F.col("request"))
    return reqs.select(
        "doc_id",
        env["request"]["contents"].getItem(0)["role"].alias("role"),
        env["request"]["contents"]
        .getItem(0)["parts"]
        .getItem(0)["text"]
        .alias("text_part"),
        env["request"]["generationConfig"]["max_output_tokens"].alias(
            "max_output_tokens"
        ),
        env["request"]["generationConfig"]["temperature"].alias("temperature"),
    )


def q_question_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#41 substring extraction over a synthesized exam-style prompt."""
    docs = _documents_with_ids(spark, sf_dir)
    exam = docs.withColumn(
        "exam_prompt",
        F.format_string(
            "Answer the exam.\nQuestion: %s\nOptions: 1,2,3,4",
            F.substring("text", 1, 40),
        ),
    )
    return exam.select(
        "doc_id",
        responses.question_preview("exam_prompt").alias("question"),
    )


# -- north-star: dedup -------------------------------------------------------


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash group-by (§2.D). The fixture has no exact
    dups, so the corpus is unioned with a shifted copy of itself; the
    survivor set must be exactly the original ids, each with 2 copies."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shifted = docs.select(
        (F.col("doc_id") + F.lit(100000)).alias("doc_id"), "text"
    )
    unioned = docs.unionAll(shifted)
    return (
        unioned.groupBy(hashing.portable_hash60("text").alias("__h"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
        .select("doc_id", "n_copies")
    )


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature per document (flattened to a string for the
    driver's value hash)."""
    docs = load_table(spark, sf_dir, "documents")
    sig = dedup.minhash_signature(dedup.shingle_hashes("text"))
    return docs.select(
        "doc_id", F.concat_ws("-", sig).alias("signature")
    )


def q_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding candidate pairs (pre-verification)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.candidate_pairs(docs, "doc_id", "text")


def q_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicates, Jaccard-verified at ≥ 0.8."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.near_dup_pairs(docs, "doc_id", "text")


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", dedup.simhash("text").alias("simhash"))


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3 via nibble banding)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.simhash_near_dup_pairs(docs, "doc_id", "text")
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


# -- north-star: similarity search ------------------------------------------


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first ANN_N_QUERIES vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_N_QUERIES)
    return similarity.topk_bruteforce(emb, queries)


def q_embedding_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit LSH-bucketed top-5 (the scale path; recall < 1)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_N_QUERIES)
    return similarity.topk_lsh(emb, queries)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within sign-bit cells."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_pairs(emb)


QUERIES: dict[str, callable] = {
    "assign_ids": q_assign_ids,
    "build_requests": q_build_requests,
    "azure_model_rewrite": q_azure_model_rewrite,
    "mock_responses": q_mock_responses,
    "extract_answer": q_extract_answer,
    "error_split": q_error_split,
    "joinback": q_joinback,
    "label_distribution": q_label_distribution,
    "vertex_requests": q_vertex_requests,
    "question_preview": q_question_preview,
    "exact_dedup": q_exact_dedup,
    "minhash_signatures": q_minhash_signatures,
    "lsh_candidates": q_lsh_candidates,
    "near_dup_pairs": q_near_dup_pairs,
    "simhash": q_simhash,
    "simhash_near_dup": q_simhash_near_dup,
    "embedding_topk": q_embedding_topk,
    "embedding_topk_lsh": q_embedding_topk_lsh,
    "embedding_near_dup": q_embedding_near_dup,
}
