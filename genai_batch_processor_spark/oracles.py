"""DuckDB oracle SQL for every query in ``queries.py``.

Each SQL string is generated from the SAME constants (templates, label
sets, hash coefficients) the Spark queries use, so the two sides cannot
drift apart. Tables are pre-registered views (driver contract):
region nation customer supplier part orders lineitem events documents
embeddings.
"""

from __future__ import annotations

from genai_batch_processor_spark.functions.hashing import sql_hash32
from genai_batch_processor_spark.inference import mock
from genai_batch_processor_spark.operators import requests

LABELS = mock.DEFAULT_LABELS

# Shared fragments ------------------------------------------------------------

IDX = "(row_number() OVER (ORDER BY doc_id) - 1)"
CUSTOM_ID = "('request-' || idx)"


def _prompt_sql(text_expr: str = "text") -> str:
    head, tail = requests.CLASSIFY_TEMPLATE.split("%s", 1)
    mid, end = tail.split("%s", 1)
    labels = ", ".join(LABELS)
    # template: "...from [%s]. Reply... Text: %s"
    return f"('{head}{labels}{mid}' || {text_expr} || '{end}')"


def _label_sql(prompt_expr: str) -> str:
    return mock.sql_label(prompt_expr, LABELS)


def _is_error_sql(cid_expr: str) -> str:
    return mock.sql_is_error(cid_expr)


_DOCS_BASE = f"""
WITH base AS (
  SELECT doc_id, text, lang, {IDX} AS idx FROM documents
), keyed AS (
  SELECT *, {CUSTOM_ID} AS custom_id, {_prompt_sql('text')} AS prompt
  FROM base
), responded AS (
  SELECT *,
         {_is_error_sql('custom_id')} AS is_error,
         {_label_sql('prompt')} AS label
  FROM keyed
)
"""

ORACLES: dict[str, str] = {
    "assign_ids": f"""
        WITH base AS (
          SELECT doc_id, {IDX} AS idx FROM documents
        )
        SELECT doc_id, CAST(idx AS BIGINT) AS idx, {CUSTOM_ID} AS custom_id
        FROM base
    """,
    "build_requests": f"""
        WITH base AS (
          SELECT doc_id, text, {IDX} AS idx FROM documents
        )
        SELECT doc_id,
               {CUSTOM_ID} AS custom_id,
               'POST' AS method,
               '{requests.CHAT_COMPLETIONS_URL}' AS url,
               '{requests.DEFAULT_MODEL}' AS model,
               10 AS max_tokens,
               CAST(0.0 AS DOUBLE) AS temperature,
               'json_object' AS response_format,
               1 AS n_messages,
               {_prompt_sql('text')} AS prompt
        FROM base
    """,
    "azure_model_rewrite": """
        SELECT doc_id, 'my-deploy' AS model FROM documents
    """,
    "mock_responses": _DOCS_BASE + """
        SELECT custom_id,
               CASE WHEN is_error THEN 'error' ELSE 'ok' END AS status,
               CASE WHEN is_error THEN NULL
                    ELSE '{"answer": "' || label || '"}' END AS content
        FROM responded
    """,
    "extract_answer": _DOCS_BASE + """
        SELECT doc_id,
               CASE WHEN is_error THEN NULL ELSE label END AS answer
        FROM responded
    """,
    "error_split": _DOCS_BASE + """
        SELECT relation, CAST(count(*) AS BIGINT) AS n
        FROM (
          SELECT CASE WHEN is_error THEN 'errors' ELSE 'results' END AS relation
          FROM responded
        )
        GROUP BY relation
        ORDER BY relation
    """,
    "joinback": _DOCS_BASE + """
        SELECT doc_id, lang,
               CASE WHEN is_error THEN 'error' ELSE 'ok' END AS status,
               CASE WHEN is_error THEN NULL ELSE label END AS answer
        FROM responded
    """,
    "label_distribution": _DOCS_BASE + """
        SELECT lang, label AS answer, CAST(count(*) AS BIGINT) AS n
        FROM responded
        WHERE NOT is_error
        GROUP BY lang, label
    """,
    "vertex_requests": """
        SELECT doc_id,
               'user' AS role,
               text AS text_part,
               50 AS max_output_tokens,
               CAST(0.0 AS DOUBLE) AS temperature
        FROM documents
    """,
    "question_preview": r"""
        SELECT doc_id,
               trim(regexp_extract(
                 'Answer the exam.' || chr(10) || 'Question: ' ||
                 substr(text, 1, 40) || chr(10) || 'Options: 1,2,3,4',
                 'Question:\s*([^\n]*)', 1)) AS question
        FROM documents
    """,
}
