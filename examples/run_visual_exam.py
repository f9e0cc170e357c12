"""Migration twin of the reference's visual-exam example
(``examples/openai/run_visual_exam.py``): multimodal requests mixing a
text part with a base64 data-URI image part (``ex-vis:93-104``), built
entirely as column expressions over a binary image column.

The reference reads image files from disk per row (``ex-vis:42-49``);
here the binary payloads are a column (at scale: ``spark.read.format
("binaryFile")`` or parquet with a binary column) — the fixtures carry
deterministic fake bytes since this container has no image codecs.

Run:  python examples/run_visual_exam.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

# allow `python examples/<script>.py` from anywhere: put the repo
# root (the package home) on sys.path before package imports
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from genai_batch_processor_spark import OpenAIBatchPipeline
from genai_batch_processor_spark.functions import ids
from genai_batch_processor_spark.operators import multimodal, requests, responses
from genai_batch_processor_spark.session import get_spark
from genai_batch_processor_spark.sources.tables import load_table

EXAM_PROMPT = (
    "Look at the attached exam image and answer. Reply as JSON "
    '{"answer": "<option_number>"}.'
)


class VisualExamPipeline(OpenAIBatchPipeline):
    """Text part + image part per request (ex-vis:76-128)."""

    def build_requests(self, df: DataFrame, **kwargs) -> DataFrame:
        content: Column = F.array(
            requests.text_part(F.lit(EXAM_PROMPT)),
            requests.image_part(
                multimodal.data_uri(F.col("image_bytes"), "image/png")
            ),
        )
        return requests.build_openai_requests(
            df, id_col="idx", user_content=content, max_tokens=100
        )  # ex-vis:113 budget (max_completion_tokens=100)


def main(spark: SparkSession | None = None, sf_dir: str | None = None):
    spark = spark or get_spark("example-visual-exam")
    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    )
    docs = ids.assign_ids(
        load_table(spark, sf_dir, "documents").limit(20), "doc_id"
    )
    # stand-in image payloads (no codecs in this container); swap for a
    # binaryFile source in production
    exam = docs.withColumn(
        "image_bytes", multimodal.fake_image_bytes(F.col("text"))
    )
    pipe = VisualExamPipeline(spark)
    results, errors = pipe.run(exam, poll_interval_seconds=0.01)
    answered = results.select(
        "doc_id",
        responses.extract_answer(
            responses.extract_content(F.col("resp"))
        ).alias("answer"),
    )
    return answered, errors


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else None
    answered, errors = main(sf_dir=sf)
    answered.show()
    print(f"errors: {errors.count()}")
