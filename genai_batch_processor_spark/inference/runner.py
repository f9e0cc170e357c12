"""Distributed inference stage: batched, rate-limited mapInPandas worker.

The "UDFs for GenAI" path (BASELINE.json north star): each executor
partition drives a client over Arrow batches — the live-inference
alternative to the async file-batch flow. Row-at-a-time Python UDFs are
banned (~10-100× slower); this is an iterator-of-pandas-batches worker so
one client is constructed per partition, requests go out in micro-batches,
and a token-bucket limiter bounds per-executor request rate.

At 100 TB scale: parallelism = #partitions (repartition to the provider's
aggregate rate limit / per-worker rate); no driver involvement per row;
failures surface as error rows (never exceptions mid-batch), mirroring
the provider's own error relation.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

from genai_batch_processor_spark.operators import responses as resp_ops

ClientFactory = Callable[[], Any]  # () -> object with complete_batch()


def run_inference(
    df: DataFrame,
    client_factory: ClientFactory,
    *,
    custom_id_col: str = "custom_id",
    prompt_col: str = "prompt",
    micro_batch_size: int = 64,
    requests_per_second: float | None = None,
    max_retries: int = 3,
    backoff_seconds: float = 0.5,
    response_col: str = "resp",
) -> DataFrame:
    """prompt rows → typed OPENAI_RESPONSE structs via a per-partition client.

    The client is anything exposing ``complete_batch([(custom_id, prompt)])
    -> list[dict]`` shaped like schema B3 (mock.MockInferenceClient in
    tests; a real HTTP client in production).

    Transient client exceptions retry with exponential backoff
    (the reference has no retry at all — SURVEY.md §4 gap list); a chunk
    that still fails after ``max_retries`` becomes error ROWS, not a task
    failure, so one bad micro-batch cannot kill a multi-hour stage.
    """

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        interval = (
            micro_batch_size / requests_per_second if requests_per_second else 0.0
        )

        def call_with_retry(rows: list[tuple[str, str]]) -> list[dict]:
            delay = backoff_seconds
            for attempt in range(max_retries + 1):
                try:
                    return client.complete_batch(rows)
                except Exception as exc:  # noqa: BLE001 — boundary by design
                    if attempt == max_retries:
                        return [
                            {
                                "custom_id": cid,
                                "error": {
                                    "message": f"client failed after "
                                    f"{max_retries + 1} attempts: {exc}"
                                },
                                "response": None,
                            }
                            for cid, _ in rows
                        ]
                    time.sleep(delay)
                    delay *= 2
            raise AssertionError("unreachable")

        for pdf in batches:
            for start in range(0, len(pdf), micro_batch_size):
                chunk = pdf.iloc[start : start + micro_batch_size]
                t0 = time.monotonic()
                out = call_with_retry(
                    list(zip(chunk[custom_id_col], chunk[prompt_col]))
                )
                yield pd.DataFrame({"resp_json": [json.dumps(r) for r in out]})
                if interval:
                    elapsed = time.monotonic() - t0
                    if elapsed < interval:
                        time.sleep(interval - elapsed)

    raw = df.select(custom_id_col, prompt_col).mapInPandas(
        worker, schema="resp_json string"
    )
    return raw.select(resp_ops.parse_response_json("resp_json").alias(response_col))
