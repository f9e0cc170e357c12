"""Migration twin of the reference's OpenAI text-classifier example
(``examples/openai/run_text_classifier.py``): classify free-text records
into fixed labels through the batch lifecycle.

Differences from the reference (by design): input is a DataFrame (any
Spark source) instead of an in-memory list; the per-row request builder
is a column expression instead of a Python `_create_request`; the
provider boundary is an injected backend — `LocalMockBackend` here, the
real `OpenAIBatchBackend` in production (same pipeline code).

Run:  python examples/run_text_classifier.py  [sf_dir]
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

from genai_batch_processor_spark import OpenAIBatchPipeline
from genai_batch_processor_spark.functions import ids
from genai_batch_processor_spark.operators import responses
from genai_batch_processor_spark.session import get_spark
from genai_batch_processor_spark.sources.tables import load_table

LABELS = ("positive", "negative", "neutral")


def main(spark: SparkSession | None = None, sf_dir: str | None = None):
    spark = spark or get_spark("example-text-classifier")
    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    )
    docs = ids.assign_ids(load_table(spark, sf_dir, "documents"), "doc_id")

    # NOTE: pipe.cleanup() must wait until the returned lazy relations
    # have been consumed — they read from the pipeline's work_dir.
    pipe = OpenAIBatchPipeline(spark)
    results, errors = pipe.run(
        docs, labels=LABELS, temperature=0.1,  # ex-cls:59-60 budget
        poll_interval_seconds=0.01,
    )
    answered = results.select(
        "doc_id",
        responses.extract_answer(
            responses.extract_content(F.col("resp"))
        ).alias("answer"),
    )
    summary = answered.groupBy("answer").count()
    return answered, errors, summary


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else None
    answered, errors, summary = main(sf_dir=sf)
    print(f"answers: {answered.count()}  errors: {errors.count()}")
    summary.show()
