"""Streaming ingestion of provider result shards (north-star streaming
surface over the reference's batch retrieve).

The reference downloads the WHOLE output file after the job reaches a
terminal state (``openai_batch_processor.py:205-260``). At scale,
providers deliver results as many JSONL shards that land over time; a
streaming reader joins each shard back to the inputs AS IT ARRIVES
instead of waiting for the last one:

- file-source text stream over the result directory (new shards picked
  up per micro-batch; ``maxFilesPerTrigger`` bounds per-batch work),
- the same typed ``from_json`` parse the batch scanner uses — one
  parsing definition, two execution modes,
- a stream-STATIC equi join on the extracted request ordinal: no
  watermark, no stream-side state — the static input relation is the
  join's build side, so each micro-batch is a bounded hash join and
  results append incrementally, exactly-once under checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genai_batch_processor_spark.functions import ids
from genai_batch_processor_spark.operators import responses


def stream_response_lines(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of raw JSONL result lines; the text source
    has a fixed one-column schema, so no probe read is needed."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.text(path)


def joinback_stream(
    resp_lines: DataFrame, inputs: DataFrame, id_col: str = "idx"
) -> DataFrame:
    """Parse streaming result lines and join them back to the static
    input relation on the request ordinal — the streaming twin of
    operators/joinback.attach_results."""
    parsed = resp_lines.select(
        responses.parse_response_json("value").alias("resp")
    )
    resps = parsed.select(
        ids.extract_index(F.col("resp.custom_id")).alias(id_col),
        responses.status_branch(F.col("resp")).alias("status"),
        responses.extract_answer(
            responses.extract_content(F.col("resp"))
        ).alias("answer"),
    )
    return resps.join(inputs, id_col)
