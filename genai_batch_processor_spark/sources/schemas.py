"""Declared StructTypes for every record shape the engine moves.

The reference is schema-on-read / duck-typed throughout (SURVEY.md §1);
the engine declares these explicitly so JSONL scans never infer, corrupt
rows are quarantined instead of branch-handled per row
(vs ``examples/openai/run_text_classifier.py:111-117``), and plans are
stable. Shapes derive from:

- OpenAI batch request line: ``openai_batch_processor.py:88``,
  ``examples/openai/run_text_classifier.py:49-62``,
  ``examples/openai/run_visual_exam.py:93-128``.
- OpenAI batch response line: ``run_text_classifier.py:104-117``,
  ``run_visual_exam.py:186-196``.
- Vertex request envelope: ``vertex_ai_batch_processor.py:131,159,167-170``.
- Vertex response row: ``vertex_ai_batch_processor.py:267-273``,
  ``examples/vertex_ai/run_text_classifier.py:153-162``.

Polymorphic ``content`` (plain string vs typed-parts array,
``run_text_classifier.py:56`` vs ``run_visual_exam.py:93-104``) is
normalized: content is ALWAYS an array of parts; plain text becomes a
one-element ``[{type:'text', text}]`` array.
"""

from __future__ import annotations

from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# -- OpenAI ----------------------------------------------------------------

CONTENT_PART = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField(
            "image_url",
            T.StructType([T.StructField("url", T.StringType())]),
        ),
    ]
)

MESSAGE = T.StructType(
    [
        T.StructField("role", T.StringType()),
        T.StructField("content", T.ArrayType(CONTENT_PART)),
    ]
)

OPENAI_BODY = T.StructType(
    [
        T.StructField("model", T.StringType()),
        T.StructField("messages", T.ArrayType(MESSAGE)),
        T.StructField("max_tokens", T.IntegerType()),
        T.StructField("max_completion_tokens", T.IntegerType()),
        T.StructField("temperature", T.DoubleType()),
        T.StructField(
            "response_format",
            T.StructType([T.StructField("type", T.StringType())]),
        ),
    ]
)

OPENAI_REQUEST = T.StructType(
    [
        T.StructField("custom_id", T.StringType(), False),
        T.StructField("method", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("body", OPENAI_BODY),
    ]
)

OPENAI_RESPONSE = T.StructType(
    [
        T.StructField("custom_id", T.StringType()),
        T.StructField(
            "error", T.StructType([T.StructField("message", T.StringType())])
        ),
        T.StructField(
            "response",
            T.StructType(
                [
                    T.StructField("status_code", T.IntegerType()),
                    T.StructField(
                        "body",
                        T.StructType(
                            [
                                T.StructField(
                                    "choices",
                                    T.ArrayType(
                                        T.StructType(
                                            [
                                                T.StructField(
                                                    "message",
                                                    T.StructType(
                                                        [
                                                            T.StructField(
                                                                "content",
                                                                T.StringType(),
                                                            ),
                                                            T.StructField(
                                                                "refusal",
                                                                T.StringType(),
                                                            ),
                                                        ]
                                                    ),
                                                )
                                            ]
                                        )
                                    ),
                                )
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)

# -- Vertex ----------------------------------------------------------------

VERTEX_REQUEST = T.StructType(
    [
        T.StructField(
            "contents",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("role", T.StringType()),
                        T.StructField(
                            "parts",
                            T.ArrayType(
                                T.StructType(
                                    [T.StructField("text", T.StringType())]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
        T.StructField(
            "generationConfig",
            T.StructType(
                [
                    T.StructField("temperature", T.DoubleType()),
                    T.StructField("max_output_tokens", T.IntegerType()),
                    T.StructField("top_p", T.DoubleType()),
                ]
            ),
        ),
    ]
)

# GCS line envelope: {"request": {...}} (vertex_ai_batch_processor.py:131)
VERTEX_REQUEST_LINE = T.StructType(
    [T.StructField("request", VERTEX_REQUEST, False)]
)

# Keyed envelope: the reference correlates vertex results POSITIONALLY
# (zip join, ex-vcls:149); we instead ride an explicit custom_id through
# the line — Vertex batch prediction passes unknown input keys through
# to the output, so the key comes back with the response.
VERTEX_KEYED_REQUEST_LINE = T.StructType(
    [
        T.StructField("custom_id", T.StringType()),
        T.StructField("request", VERTEX_REQUEST, False),
    ]
)

VERTEX_RESPONSE = T.StructType(
    [
        T.StructField("request", T.StringType()),
        T.StructField(
            "response",
            T.StructType(
                [
                    T.StructField(
                        "candidates",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField(
                                        "content",
                                        T.StructType(
                                            [
                                                T.StructField(
                                                    "parts",
                                                    T.ArrayType(
                                                        T.StructType(
                                                            [
                                                                T.StructField(
                                                                    "text",
                                                                    T.StringType(),
                                                                )
                                                            ]
                                                        )
                                                    ),
                                                )
                                            ]
                                        ),
                                    )
                                ]
                            )
                        ),
                    ),
                    T.StructField(
                        "error",
                        T.StructType([T.StructField("message", T.StringType())]),
                    ),
                ]
            ),
        ),
    ]
)

# Structured-answer payload the model is forced to emit via
# response_format json_object (run_multichoice_exam.py:59,124-129).
ANSWER = T.StructType([T.StructField("answer", T.StringType())])


def with_corrupt_column(schema: T.StructType) -> T.StructType:
    """Schema + quarantine column for permissive JSONL scans."""
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
