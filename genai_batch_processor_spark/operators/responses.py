"""Response processing: parse → branch → split → extract → structured answer.

Covers (SURVEY.md §2): #12 result scan, #13 error-relation split,
#38 tri-state status branch (ex-cls:111-117), #39 deep nested extraction
(ex-cls:114, ex-vcls:157), #40 structured-answer parse (ex-mc:124-132),
#45 refusal/null-content fallback (ex-vis:189-192), #46 per-item error
recovery (ex-vcls:155-166).

All expressions are null-safe typed-schema accesses — the Spark
replacement for the reference's duck-typed defensive branching.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from genai_batch_processor_spark.sources import schemas

STATUS_ERROR = "error"
STATUS_OK = "ok"
STATUS_OTHER = "other"


def parse_response_json(json_col: Column | str) -> Column:
    """JSONL line → typed OPENAI_RESPONSE struct (#12)."""
    c = F.col(json_col) if isinstance(json_col, str) else json_col
    return F.from_json(c, schemas.OPENAI_RESPONSE)


def status_branch(resp: Column) -> Column:
    """Tri-state: error present / HTTP 200 / other (#38)."""
    return (
        F.when(resp["error"].isNotNull(), F.lit(STATUS_ERROR))
        .when(resp["response"]["status_code"] == 200, F.lit(STATUS_OK))
        .otherwise(F.lit(STATUS_OTHER))
    )


def extract_content(resp: Column) -> Column:
    """choices[0].message.content with refusal fallback (#39 + #45)."""
    msg = resp["response"]["body"]["choices"].getItem(0)["message"]
    return F.coalesce(msg["content"], msg["refusal"])


def extract_answer(content: Column) -> Column:
    """Structured-answer parse: '{"answer": …}' → answer (#40);
    malformed JSON → null (reference warns per row, ex-mc:130-132)."""
    return F.from_json(content, schemas.ANSWER)["answer"]


def extract_vertex_text(resp: Column) -> Column:
    """Gemini candidates[0].content.parts[0].text (#39, ex-vcls:157)."""
    return (
        resp["response"]["candidates"].getItem(0)["content"]["parts"].getItem(0)["text"]
    )


def split_errors(df: DataFrame, resp_col: str = "resp") -> tuple[DataFrame, DataFrame]:
    """One scan → (results, errors) complement filters (#13).

    The reference downloads two separate provider files (oai:226,245);
    a single relation split keeps it one pass.
    """
    err = F.col(resp_col)["error"].isNotNull()
    return df.filter(~err), df.filter(err)


def question_preview(prompt: Column | str) -> Column:
    """Substring extraction (#41): first line after 'Question:'
    (ex-mc:112-116)."""
    c = F.col(prompt) if isinstance(prompt, str) else prompt
    return F.trim(F.regexp_extract(c, r"Question:\s*([^\n]*)", 1))
