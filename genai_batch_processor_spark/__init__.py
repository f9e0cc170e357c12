"""PySpark-native batch GenAI dataflow engine.

A from-scratch re-expression of the capabilities of
``baeseongsu/genai-batch-processor`` (reference read-only at
``/root/reference``) on Apache Spark DataFrames: per-row request
projection, JSONL encode/decode, async-batch orchestration boundary,
response parsing/extraction, result join-back — plus the large-scale
training-data-pipeline operators the reference's north star mandates
(dedup, similarity search, multimodal columns, text analysis).

Public API (mirrors reference ``src/genai_batch_processor/__init__.py:3-10``,
re-expressed as Spark pipelines):

- :class:`~genai_batch_processor_spark.plans.pipeline.OpenAIBatchPipeline`
- :class:`~genai_batch_processor_spark.plans.pipeline.AzureOpenAIBatchPipeline`
- :class:`~genai_batch_processor_spark.plans.pipeline.VertexAIBatchPipeline`

Everything is DataFrame-first: no RDDs, no ``collect()`` on data paths,
explicit schemas everywhere (reference is duck-typed; see SURVEY.md §1).
"""

from genai_batch_processor_spark.plans.pipeline import (
    AzureOpenAIBatchPipeline,
    BatchPipeline,
    OpenAIBatchPipeline,
    VertexAIBatchPipeline,
)
from genai_batch_processor_spark.session import get_spark

__all__ = [
    "AzureOpenAIBatchPipeline",
    "BatchPipeline",
    "OpenAIBatchPipeline",
    "VertexAIBatchPipeline",
    "get_spark",
]

__version__ = "0.1.0"
