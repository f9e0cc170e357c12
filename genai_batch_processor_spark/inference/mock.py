"""Deterministic mock inference — hermetic replacement for live APIs.

The reference's tests are live-API smoke scripts (SURVEY.md §5); this
engine replaces them with a mock that maps each request to a response as
a *pure function* of the prompt text, available in two equivalent forms:

1. :func:`mock_response_columns` — JVM-side column expressions, so whole
   pipelines that embed the mock stay oracle-checkable in DuckDB.
2. :class:`MockInferenceClient` — plain Python with the identical
   algorithm, driven through the ``mapInPandas`` runner
   (inference.runner) to exercise the real distributed-inference
   plumbing. Tests assert both paths produce byte-identical results.

Determinism rule (FIXTURES.md): label = portable_hash32(prompt) mod
len(labels); a request whose custom_id hashes to 3 (mod ERROR_MODULUS)
fails with a synthetic error — exercising the tri-state status branch
(#38) and the error-relation split (#13).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

from genai_batch_processor_spark.functions.hashing import portable_hash32

DEFAULT_LABELS = ("positive", "negative", "neutral")
ERROR_MODULUS = 13
ERROR_RESIDUE = 3
ERROR_MESSAGE = "mock: simulated provider error"


def label_expr(prompt: Column, labels: tuple[str, ...] = DEFAULT_LABELS) -> Column:
    """Deterministic label pick: portable_hash32(prompt) mod n."""
    idx = portable_hash32(prompt) % F.lit(len(labels))
    mapping = F.array(*[F.lit(lab) for lab in labels])
    return F.element_at(mapping, idx.cast("int") + 1)


def is_error_expr(custom_id: Column) -> Column:
    return portable_hash32(custom_id) % ERROR_MODULUS == ERROR_RESIDUE


def mock_content_expr(
    prompt: Column, labels: tuple[str, ...] = DEFAULT_LABELS
) -> Column:
    """The assistant message content: '{"answer": "<label>"}'."""
    return F.concat(F.lit('{"answer": "'), label_expr(prompt, labels), F.lit('"}'))


def mock_response_columns(
    custom_id: Column,
    prompt: Column,
    labels: tuple[str, ...] = DEFAULT_LABELS,
) -> Column:
    """Full OPENAI_RESPONSE-shaped struct for a request (schema B3)."""
    err = is_error_expr(custom_id)
    ok_body = F.struct(
        F.array(
            F.struct(
                F.struct(
                    mock_content_expr(prompt, labels).alias("content"),
                    F.lit(None).cast("string").alias("refusal"),
                ).alias("message")
            )
        ).alias("choices")
    )
    return F.struct(
        custom_id.alias("custom_id"),
        F.when(err, F.struct(F.lit(ERROR_MESSAGE).alias("message"))).alias("error"),
        F.when(
            ~err,
            F.struct(F.lit(200).alias("status_code"), ok_body.alias("body")),
        ).alias("response"),
    )


_VERTEX_NO_CANDIDATES = (
    "array<struct<content:struct<parts:array<struct<text:string>>>>>"
)


def mock_vertex_response_columns(
    custom_id: Column,
    prompt: Column,
    request_json: Column,
    labels: tuple[str, ...] = DEFAULT_LABELS,
) -> Column:
    """VERTEX_RESPONSE-shaped struct (vtx:267-273 output row): the
    original request line echoed as a string — the passthrough
    custom_id rides back inside it — plus candidates or a per-row error.
    Same determinism rule as the OpenAI mock."""
    err = is_error_expr(custom_id)
    ok = F.struct(
        F.array(
            F.struct(
                F.struct(
                    F.array(
                        F.struct(label_expr(prompt, labels).alias("text"))
                    ).alias("parts")
                ).alias("content")
            )
        ).alias("candidates"),
        F.lit(None).cast("struct<message:string>").alias("error"),
    )
    err_resp = F.struct(
        F.lit(None).cast(_VERTEX_NO_CANDIDATES).alias("candidates"),
        F.struct(F.lit(ERROR_MESSAGE).alias("message")).alias("error"),
    )
    return F.struct(
        request_json.alias("request"),
        F.when(err, err_resp).otherwise(ok).alias("response"),
    )


# -- Python twin (for the mapInPandas runner) --------------------------------


def _hash32(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


class MockInferenceClient:
    """Batch-capable mock client; same algorithm as the column exprs."""

    def __init__(self, labels: tuple[str, ...] = DEFAULT_LABELS):
        self.labels = labels

    def complete(self, custom_id: str, prompt: str) -> dict:
        if _hash32(custom_id) % ERROR_MODULUS == ERROR_RESIDUE:
            return {
                "custom_id": custom_id,
                "error": {"message": ERROR_MESSAGE},
                "response": None,
            }
        label = self.labels[_hash32(prompt) % len(self.labels)]
        return {
            "custom_id": custom_id,
            "error": None,
            "response": {
                "status_code": 200,
                "body": {
                    "choices": [
                        {
                            "message": {
                                "content": '{"answer": "%s"}' % label,
                                "refusal": None,
                            }
                        }
                    ]
                },
            },
        }

    def complete_batch(self, rows: list[tuple[str, str]]) -> list[dict]:
        return [self.complete(cid, prompt) for cid, prompt in rows]


# -- DuckDB oracle fragments -------------------------------------------------


def sql_label(prompt_expr: str, labels: tuple[str, ...] = DEFAULT_LABELS) -> str:
    from genai_batch_processor_spark.functions.hashing import sql_hash32

    arr = "[" + ", ".join(f"'{lab}'" for lab in labels) + "]"
    return f"({arr}[({sql_hash32(prompt_expr)} % {len(labels)})::INT + 1])"


def sql_is_error(custom_id_expr: str) -> str:
    from genai_batch_processor_spark.functions.hashing import sql_hash32

    return f"({sql_hash32(custom_id_expr)} % {ERROR_MODULUS} = {ERROR_RESIDUE})"
