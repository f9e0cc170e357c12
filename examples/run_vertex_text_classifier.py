"""Migration twin of the reference's Vertex text-classifier example
(``examples/vertex_ai/run_text_classifier.py``): Gemini-shaped requests
through the Vertex batch lifecycle with the keyed envelope join-back
(replacing the reference's positional zip join, ``ex-vcls:149``).

Swap ``VertexLocalMockBackend`` for the real ``VertexBatchBackend``
(gs:///bq:// src/dest) and ``table_store`` for
``BigQueryTableStore`` in production — the pipeline code is identical.

Run:  python examples/run_vertex_text_classifier.py  [sf_dir]
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

from genai_batch_processor_spark.functions import ids
from genai_batch_processor_spark.operators import responses
from genai_batch_processor_spark.plans.pipeline import VertexAIBatchPipeline
from genai_batch_processor_spark.session import get_spark
from genai_batch_processor_spark.sources.tables import load_table


def main(spark: SparkSession | None = None, sf_dir: str | None = None):
    spark = spark or get_spark("example-vertex-classifier")
    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    )
    docs = ids.assign_ids(load_table(spark, sf_dir, "documents"), "doc_id")
    pipe = VertexAIBatchPipeline(spark)
    results, errors = pipe.run(
        docs, max_output_tokens=50, poll_interval_seconds=0.01
    )
    answered = results.select(
        "doc_id",
        responses.extract_vertex_text(F.col("resp")).alias("answer"),
    )
    return answered, errors


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else None
    answered, errors = main(sf_dir=sf)
    print(f"answers: {answered.count()}  errors: {errors.count()}")
    answered.groupBy("answer").count().show()
