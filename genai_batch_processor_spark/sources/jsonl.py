"""JSONL sources & sinks — the reference's wire format, distributed.

Replaces the single-threaded temp-file encode loop
(``openai_batch_processor.py:136-145``) and the driver-memory parse
(``openai_batch_processor.py:226-229``) with distributed `to_json` writes
and explicit-schema `spark.read.json` scans. Blank lines are dropped by
the reader (the reference filters them by hand at ``oai:229``); malformed
lines land in a quarantine column instead of raising mid-batch.

Scale notes:
- writes are sharded via ``maxRecordsPerFile`` (provider batch files have
  row/size caps — the reference writes ONE temp file, ``oai:136``, which
  cannot scale); a 100 TB input becomes N capped shards, each of which the
  orchestrator can submit as its own provider job.
- reads glob ALL shards (fixes the reference bug of reading only the first
  predictions shard, ``vertex_ai_batch_processor.py:273``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from genai_batch_processor_spark.sources import schemas


def write_jsonl(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 50_000,
    num_shards: int | None = None,
) -> None:
    """Serialize every row as one JSON line; sharded text sink.

    ``to_json(struct(*))`` runs JVM-side (codegen), unlike the reference's
    per-row ``json.dumps`` loop (``oai:145``).
    """
    out = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    if num_shards is not None:
        out = out.repartition(num_shards)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .text(path)
    )


def write_jsonl_planned(
    df: DataFrame, path: str, shard_col: str = "shard_key"
) -> None:
    """Shard-planned JSONL sink: each planned shard
    (operators/batching.plan_shards output) lands as its own
    ``shard_key=…`` directory — the file set a capped batch-upload loop
    iterates, one provider file per shard. One exchange on the shard
    key (so a shard is written by one task as one file), then a
    partitioned text sink; the payload is JVM-side ``to_json``."""
    payload = [c for c in df.columns if c != shard_col]
    out = df.select(
        F.col(shard_col),
        F.to_json(F.struct(*payload)).alias("value"),
    ).repartition(F.col(shard_col))
    out.write.mode("overwrite").partitionBy(shard_col).text(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Explicit-schema JSONL scan → (good rows, quarantined corrupt rows).

    Replaces duck-typed per-row branching (``run_text_classifier.py:111-117``)
    with a declared schema + corrupt-record quarantine (SURVEY.md §7).
    """
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    # PERMISSIVE from_json yields an all-null struct for malformed lines, so
    # a null test on the struct itself can't quarantine; parse with an
    # explicit corrupt-record column instead.
    parse_schema = schemas.with_corrupt_column(schema)
    parsed = raw.select(
        F.from_json(
            "value",
            parse_schema,
            {"columnNameOfCorruptRecord": schemas.CORRUPT_COL},
        ).alias("__rec"),
        "value",
    )
    is_bad = F.col(f"__rec.{schemas.CORRUPT_COL}").isNotNull()
    good = parsed.filter(~is_bad).select("__rec.*").drop(schemas.CORRUPT_COL)
    bad = parsed.filter(is_bad).select(
        F.col("value").alias(schemas.CORRUPT_COL)
    )
    return good, bad


def read_request_jsonl(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    return read_jsonl(spark, path, schemas.OPENAI_REQUEST)


def read_response_jsonl(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Scan provider output shards (globs ALL files, unlike ``vtx:273``)."""
    return read_jsonl(spark, path, schemas.OPENAI_RESPONSE)


def write_json_array(df: DataFrame, path: str) -> None:
    """Indented one-array JSON sink — the reference's
    ``{prefix}_results.json`` form (``openai_batch_processor.py:232-239``,
    ``json.dump(..., indent=2)``), byte-identical output.

    This is a DRIVER-TAIL writer for small, final result sets: rows
    stream through the driver one at a time (``toLocalIterator`` — never
    a full collect), but the single pretty-printed file is inherently a
    one-writer format. Anything large goes through :func:`write_results`
    (sharded, distributed)."""
    import json

    with open(path, "w") as f:
        first = True
        for line in df.toJSON().toLocalIterator():
            blob = json.dumps(json.loads(line), indent=2)
            indented = "\n".join("  " + ln for ln in blob.splitlines())
            f.write("[\n" if first else ",\n")
            f.write(indented)
            first = False
        f.write("[]" if first else "\n]")


def write_results(df: DataFrame, path: str, fmt: str | None = None) -> None:
    """Extension-dispatched result sink (``vtx:298-325`` semantics).

    ``.csv`` → csv with header, ``.jsonl``/``.json`` → JSON lines,
    ``.parquet`` → parquet (default). Always sharded — never coalesce(1).
    """
    fmt = fmt or (
        "csv" if path.endswith(".csv")
        else "json" if path.endswith((".jsonl", ".json"))
        else "parquet"
    )
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        writer.parquet(path)
