"""Golden wire-format fixtures for the three provider backends.

Each scenario drives a backend against a transport that (a) replays the
RESPONSES recorded in ``tests/golden/<name>.json`` and (b) asserts every
outgoing request — method, url, auth headers, body bytes — matches the
recorded transcript exactly. A wire-format change therefore fails a
golden diff, not a hand-written assertion (round-3 VERDICT gap #3;
matches reference ``oai:150-182`` / ``vtx:178-202`` formats).

Nondeterministic tokens are normalized before compare: the multipart
boundary (``----spark-graft-<uuid>``) and the Vertex display-name
suffix, both replaced with fixed placeholders on record AND replay.

Regenerate after an INTENTIONAL wire change with::

    GOLDEN_UPDATE=1 python -m pytest tests/test_golden_wire.py

then review the transcript diff like any code change.
"""

from __future__ import annotations

import base64
import json
import os
import re

import pytest

from genai_batch_processor_spark.inference.providers import (
    OpenAIBatchBackend,
    VertexBatchBackend,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
UPDATE = os.environ.get("GOLDEN_UPDATE") == "1"

_BOUNDARY_RE = re.compile(r"----spark-graft-[0-9a-f]{32}")
_DISPLAY_RE = re.compile(r"spark-graft-[0-9a-f]{8}")


def _normalize(text: str) -> str:
    text = _BOUNDARY_RE.sub("----spark-graft-BOUNDARY", text)
    return _DISPLAY_RE.sub("spark-graft-DISPLAY00", text)


def _encode_body(body: bytes | None) -> str | None:
    if body is None:
        return None
    try:
        return _normalize(body.decode("utf-8"))
    except UnicodeDecodeError:
        return "base64:" + base64.b64encode(body).decode()


class GoldenTransport:
    """Replays recorded responses; records normalized requests."""

    def __init__(self, responses: list[tuple[int, object]]):
        self.responses = list(responses)
        self.observed: list[dict] = []

    def request(self, method, url, headers, body=None):
        self.observed.append(
            {
                "method": method,
                "url": _normalize(url),
                # all header values normalized — the multipart
                # content-type carries the random boundary
                "headers": {
                    k: _normalize(v) for k, v in sorted(headers.items())
                },
                "body": _encode_body(body),
            }
        )
        if not self.responses:
            raise AssertionError(f"unexpected extra call {method} {url}")
        status, payload = self.responses.pop(0)
        if isinstance(payload, (dict, list)):
            payload = json.dumps(payload).encode()
        return status, payload


def _shard_dir(tmp_path, n):
    d = tmp_path / "shards"
    d.mkdir()
    for i in range(n):
        (d / f"part-{i:05d}.jsonl").write_text(
            json.dumps(
                {
                    "custom_id": f"request-{i}",
                    "method": "POST",
                    "url": "/v1/chat/completions",
                    "body": {
                        "model": "gpt-4o-mini",
                        "messages": [
                            {"role": "user", "content": f"classify doc {i}"}
                        ],
                    },
                }
            )
            + "\n"
        )
    return str(d)


def _check(name: str, transport: GoldenTransport, responses) -> None:
    """Compare (or record) the observed transcript against the golden
    file — requests normalized, responses as replayed."""
    transcript = {
        "requests": transport.observed,
        "responses": [
            {
                "status": s,
                "body": p if isinstance(p, (dict, list)) else repr(p),
            }
            for s, p in responses
        ],
    }
    path = os.path.join(GOLDEN_DIR, f"{name}.json")
    if UPDATE:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump(transcript, f, indent=1, sort_keys=True)
            f.write("\n")
        pytest.skip(f"golden {name} updated")
    with open(path) as f:
        golden = json.load(f)
    assert transcript["requests"] == golden["requests"], (
        f"wire format drifted from golden transcript {name}.json — if "
        "intentional, regenerate with GOLDEN_UPDATE=1 and review the diff"
    )
    assert transcript["responses"] == golden["responses"]


# -- scenarios -------------------------------------------------------------


def test_golden_openai_submit(tmp_path):
    responses = [
        (200, {"id": "file-1"}),
        (200, {"id": "batch-1", "status": "validating"}),
        (200, {"id": "file-2"}),
        (200, {"id": "batch-2", "status": "validating"}),
    ]
    t = GoldenTransport(responses)
    b = OpenAIBatchBackend("sk-test", transport=t)
    assert b.submit(_shard_dir(tmp_path, 2), "unused", {"job": "golden"}) == [
        "batch-1",
        "batch-2",
    ]
    _check("openai_submit", t, responses)


def test_golden_openai_preflight(tmp_path):
    responses = [
        (200, {"id": "chatcmpl-1", "choices": []}),
        (200, {"id": "file-1"}),
        (200, {"id": "batch-1", "status": "validating"}),
    ]
    t = GoldenTransport(responses)
    b = OpenAIBatchBackend("sk-test", preflight=True, transport=t)
    b.submit(_shard_dir(tmp_path, 1), "unused", {})
    _check("openai_preflight", t, responses)


def test_golden_openai_poll_fetch_cancel(tmp_path):
    responses = [
        (200, {"id": "batch-1", "status": "in_progress"}),
        (
            200,
            {
                "id": "batch-1",
                "status": "completed",
                "output_file_id": "f-out",
                "error_file_id": "f-err",
            },
        ),
        (
            200,
            {
                "id": "batch-1",
                "status": "completed",
                "output_file_id": "f-out",
                "error_file_id": "f-err",
            },
        ),
        (200, '{"custom_id": "request-0"}\n'),
        (200, '{"custom_id": "request-1"}\n'),
        (200, {"id": "batch-1", "status": "cancelling"}),
    ]
    t = GoldenTransport(
        [
            (s, p.encode() if isinstance(p, str) else p)
            for s, p in responses
        ]
    )
    b = OpenAIBatchBackend("sk-test", transport=t)
    assert b.status("batch-1") == "in_progress"
    assert b.status("batch-1") == "completed"
    b.fetch("batch-1", str(tmp_path / "out"))
    b.cancel("batch-1")
    _check("openai_poll_fetch_cancel", t, responses)


def test_golden_azure_submit(tmp_path):
    responses = [
        (200, {"id": "file-1"}),
        (200, {"id": "batch-1", "status": "validating"}),
    ]
    t = GoldenTransport(responses)
    b = OpenAIBatchBackend(
        "azure-key",
        azure_endpoint="https://myres.openai.azure.com",
        transport=t,
    )
    b.submit(_shard_dir(tmp_path, 1), "unused", {})
    _check("azure_submit", t, responses)


def test_golden_vertex_submit_gcs():
    responses = [
        (
            200,
            {
                "name": "projects/p1/locations/us-central1/"
                "batchPredictionJobs/77",
                "state": "JOB_STATE_PENDING",
            },
        ),
    ]
    t = GoldenTransport(responses)
    b = VertexBatchBackend(
        "p1",
        "publishers/google/models/gemini-2.0-flash-001",
        lambda: "golden-token",
        transport=t,
    )
    ids = b.submit(
        "gs://bucket/input/requests.jsonl", "gs://bucket/output/", {}
    )
    assert ids == [
        "projects/p1/locations/us-central1/batchPredictionJobs/77"
    ]
    _check("vertex_submit_gcs", t, responses)


def test_golden_vertex_submit_bq():
    responses = [
        (
            200,
            {
                "name": "projects/p1/locations/us-central1/"
                "batchPredictionJobs/78",
                "state": "JOB_STATE_PENDING",
            },
        ),
    ]
    t = GoldenTransport(responses)
    b = VertexBatchBackend(
        "p1",
        "publishers/google/models/gemini-2.0-flash-001",
        lambda: "golden-token",
        transport=t,
    )
    b.submit("bq://p1.ds.requests", "bq://p1.ds.responses", {})
    _check("vertex_submit_bq", t, responses)


def test_golden_vertex_poll_cancel():
    job = "projects/p1/locations/us-central1/batchPredictionJobs/77"
    responses = [
        (200, {"name": job, "state": "JOB_STATE_RUNNING"}),
        (200, {"name": job, "state": "JOB_STATE_SUCCEEDED"}),
        (200, {}),
        (200, {}),
    ]
    t = GoldenTransport(responses)
    b = VertexBatchBackend(
        "p1",
        "publishers/google/models/gemini-2.0-flash-001",
        lambda: "golden-token",
        transport=t,
    )
    assert b.status(job) == "in_progress"
    assert b.status(job) == "completed"
    b.cancel(job)
    b.delete(job)
    _check("vertex_poll_cancel", t, responses)
