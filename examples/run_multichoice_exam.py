"""Migration twin of the reference's multichoice-exam example
(``examples/openai/run_multichoice_exam.py``): the input rows carry
PRE-BUILT chat message lists, passed through to the request body
unchanged (``ex-mc:50-61``) — the builder only wraps them in the batch
envelope with a system prompt.

Run:  python examples/run_multichoice_exam.py
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
from genai_batch_processor_spark.operators import requests, responses
from genai_batch_processor_spark.session import get_spark

QUESTIONS = [
    (
        "Which blood type can a person with O blood type receive?\n"
        "1. Type A\n2. Type B\n3. Type AB\n4. Type O"
    ),
    (
        "Which organ produces insulin?\n"
        "1. Liver\n2. Pancreas\n3. Kidney\n4. Spleen"
    ),
    (
        "Which vitamin is produced in the skin under sunlight?\n"
        "1. Vitamin A\n2. Vitamin B12\n3. Vitamin C\n4. Vitamin D"
    ),
]

PROMPT = (
    "Answer the following multiple choice question. Reply as JSON "
    '{"answer": "<option_number>"}.\n%s'
)


class MultichoicePipeline(OpenAIBatchPipeline):
    """User-defined builder — the subclass hook mirroring the
    reference's ``_create_request`` override (ex-mc:38-61)."""

    def build_requests(self, df: DataFrame, **kwargs) -> DataFrame:
        content: Column = F.array(
            requests.text_part(F.format_string(PROMPT, F.col("question")))
        )
        return requests.build_openai_requests(
            df,
            id_col="idx",
            user_content=content,
            system_prompt="You are a medical expert.",
            max_tokens=50,
        )


def main(spark: SparkSession | None = None):
    spark = spark or get_spark("example-multichoice")
    qs = spark.createDataFrame(
        [(i, q) for i, q in enumerate(QUESTIONS)], "qid long, question string"
    )
    qs = ids.assign_ids(qs, "qid")
    pipe = MultichoicePipeline(spark)
    results, errors = pipe.run(qs, poll_interval_seconds=0.01)
    answered = results.select(
        "qid",
        "question",
        responses.extract_answer(
            responses.extract_content(F.col("resp"))
        ).alias("answer"),
    )
    return answered, errors


if __name__ == "__main__":
    answered, errors = main()
    answered.show(truncate=60)
    print(f"errors: {errors.count()}")
