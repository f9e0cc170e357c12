"""Migration twin of the reference's Azure subclass usage
(``openai_batch_processor.py:306-328``): same lifecycle as the OpenAI
classifier, with the deployment-name model rewrite applied inside the
request projection (body.model ← deployment, ``oai:106-108,141-143``).

In production, construct the backend with
``OpenAIBatchBackend(azure_endpoint=..., preflight=True)`` — the
preflight probe then hits the deployment-scoped route and the batch
files upload against the Azure dataplane; the pipeline code below is
unchanged.

Run:  python examples/run_azure_text_classifier.py  [sf_dir]
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

from genai_batch_processor_spark import AzureOpenAIBatchPipeline
from genai_batch_processor_spark.functions import ids
from genai_batch_processor_spark.operators import responses
from genai_batch_processor_spark.session import get_spark
from genai_batch_processor_spark.sources.tables import load_table

DEPLOYMENT = "my-gpt4o-mini-deployment"


def main(spark: SparkSession | None = None, sf_dir: str | None = None):
    spark = spark or get_spark("example-azure-classifier")
    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    )
    docs = ids.assign_ids(load_table(spark, sf_dir, "documents"), "doc_id")
    pipe = AzureOpenAIBatchPipeline(spark, azure_deployment=DEPLOYMENT)
    results, errors = pipe.run(docs, poll_interval_seconds=0.01)
    answered = results.select(
        "doc_id",
        F.col("request.body.model").alias("deployment"),
        responses.extract_answer(
            responses.extract_content(F.col("resp"))
        ).alias("answer"),
    )
    return answered, errors


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else None
    answered, errors = main(sf_dir=sf)
    print(f"answers: {answered.count()}  errors: {errors.count()}")
    answered.show(5, truncate=40)
