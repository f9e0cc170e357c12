"""Sources & sinks: explicit-schema readers and sharded writers."""

from genai_batch_processor_spark.sources.tables import TABLE_NAMES, load_table, load_tables
from genai_batch_processor_spark.sources.jsonl import (
    read_request_jsonl,
    read_response_jsonl,
    write_jsonl,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "read_request_jsonl",
    "read_response_jsonl",
    "write_jsonl",
]
