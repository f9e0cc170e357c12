"""Wire-format tests for the real provider backends (inference/providers.py)
against a recorded fake transport — the network seam stays mocked, the
request shapes / auth headers / state machines / retrieve step are real.
"""

from __future__ import annotations

import json
import os

import pytest

from genai_batch_processor_spark.inference import orchestrator
from genai_batch_processor_spark.inference.providers import (
    BadRequest,
    OpenAIBatchBackend,
    RetryPolicy,
    TransportError,
    VertexBatchBackend,
)


def _fast_policy(max_attempts: int = 5) -> RetryPolicy:
    """Deterministic, sleep-free policy for retry-path tests."""
    return RetryPolicy(
        max_attempts=max_attempts, base_delay=0.0, rng=lambda: 0.0
    )


class FakeTransport:
    """Routes by (method, url-substring); records every call in order."""

    def __init__(self, handler):
        self.handler = handler
        self.calls: list[tuple[str, str, dict, bytes | None]] = []

    def request(self, method, url, headers, body=None):
        self.calls.append((method, url, headers, body))
        status, payload = self.handler(method, url, body)
        if isinstance(payload, (dict, list)):
            payload = json.dumps(payload).encode()
        return status, payload

    def paths(self):
        return [(m, u.split("?")[0]) for m, u, _, _ in self.calls]


def _shard_dir(tmp_path, n=2):
    d = tmp_path / "shards"
    d.mkdir()
    for i in range(n):
        (d / f"part-{i:05d}.jsonl").write_text(
            json.dumps(
                {
                    "custom_id": f"request-{i}",
                    "method": "POST",
                    "url": "/v1/chat/completions",
                    "body": {"model": "gpt-4o-mini", "messages": []},
                }
            )
            + "\n"
        )
    return str(d)


def _openai_handler(state):
    def handler(method, url, body):
        url = url.split("?")[0]
        if url.endswith("/files") and method == "POST":
            state["uploads"] = state.get("uploads", 0) + 1
            return 200, {"id": f"file-{state['uploads']}"}
        if url.endswith("/batches") and method == "POST":
            state["batches"] = state.get("batches", 0) + 1
            return 200, {
                "id": f"batch-{state['batches']}",
                "status": "validating",
            }
        raise AssertionError(f"unexpected call {method} {url}")

    return handler


def test_openai_submit_uploads_each_shard_then_creates_batches(tmp_path):
    state: dict = {}
    t = FakeTransport(_openai_handler(state))
    b = OpenAIBatchBackend("sk-test", transport=t)
    ids = b.submit(_shard_dir(tmp_path), str(tmp_path / "out"), {"k": "v"})
    assert ids == ["batch-1", "batch-2"]
    # upload → create, interleaved per shard, nothing else
    assert [p for _, p in t.paths()] == [
        "https://api.openai.com/v1/files",
        "https://api.openai.com/v1/batches",
        "https://api.openai.com/v1/files",
        "https://api.openai.com/v1/batches",
    ]
    m, u, h, body = t.calls[0]
    assert h["Authorization"] == "Bearer sk-test"
    assert b"multipart/form-data" not in body  # boundary only in header
    assert b'name="purpose"\r\n\r\nbatch' in body
    assert b"request-0" in body  # the shard bytes rode along
    create = json.loads(t.calls[1][3])
    assert create["endpoint"] == "/v1/chat/completions"
    assert create["completion_window"] == "24h"
    assert create["metadata"] == {"k": "v"}
    assert create["input_file_id"] == "file-1"


def test_openai_status_maps_pending_states(tmp_path):
    statuses = iter(["validating", "in_progress", "finalizing", "completed"])

    def handler(method, url, body):
        return 200, {"id": "batch-1", "status": next(statuses)}

    b = OpenAIBatchBackend("sk-test", transport=FakeTransport(handler))
    assert b.status("batch-1") == "in_progress"
    assert b.status("batch-1") == "in_progress"
    assert b.status("batch-1") == "in_progress"
    assert b.status("batch-1") == "completed"


def test_openai_fetch_downloads_output_and_error_files(tmp_path):
    out_lines = b'{"custom_id": "request-0"}\n'
    err_lines = b'{"custom_id": "request-9"}\n'

    def handler(method, url, body):
        if url.endswith("/batches/batch-1"):
            return 200, {
                "id": "batch-1",
                "status": "completed",
                "output_file_id": "f-out",
                "error_file_id": "f-err",
            }
        if url.endswith("/files/f-out/content"):
            return 200, out_lines
        if url.endswith("/files/f-err/content"):
            return 200, err_lines
        raise AssertionError(url)

    b = OpenAIBatchBackend("sk-test", transport=FakeTransport(handler))
    dest = str(tmp_path / "results")
    b.fetch("batch-1", dest)
    assert open(os.path.join(dest, "batch-1.jsonl"), "rb").read() == out_lines
    assert (
        open(os.path.join(dest, "batch-1.errors.jsonl"), "rb").read()
        == err_lines
    )


def test_openai_preflight_probes_before_upload_and_aborts_on_400(tmp_path):
    def reject(method, url, body):
        if url.endswith("/chat/completions"):
            return 400, {"error": {"message": "unsupported parameter"}}
        raise AssertionError("uploaded despite failed probe")

    t = FakeTransport(reject)
    b = OpenAIBatchBackend("sk-test", preflight=True, transport=t)
    with pytest.raises(BadRequest):
        b.submit(_shard_dir(tmp_path), str(tmp_path / "out"), {})
    assert [p for _, p in t.paths()] == [
        "https://api.openai.com/v1/chat/completions"
    ]


def test_openai_preflight_success_then_uploads(tmp_path):
    state: dict = {}
    inner = _openai_handler(state)

    def handler(method, url, body):
        if url.endswith("/chat/completions"):
            # the probe body is the first request line's body
            assert json.loads(body)["model"] == "gpt-4o-mini"
            return 200, {"id": "chatcmpl-1"}
        return inner(method, url, body)

    t = FakeTransport(handler)
    b = OpenAIBatchBackend("sk-test", preflight=True, transport=t)
    ids = b.submit(_shard_dir(tmp_path, n=1), str(tmp_path / "out"), {})
    assert ids == ["batch-1"]
    assert [p for _, p in t.paths()][0].endswith("/chat/completions")


def test_openai_non_2xx_raises_transport_error(tmp_path):
    t = FakeTransport(lambda m, u, bd: (500, b"boom"))
    b = OpenAIBatchBackend(
        "sk-test", transport=t, retry_policy=_fast_policy(max_attempts=3)
    )
    with pytest.raises(TransportError, match="HTTP 500"):
        b.status("batch-1")
    assert len(t.calls) == 3  # retried up to the budget, then surfaced


def test_azure_url_shape_and_header(tmp_path):
    state: dict = {}
    t = FakeTransport(_openai_handler(state))
    b = OpenAIBatchBackend(
        "azkey",
        azure_endpoint="https://myres.openai.azure.com",
        transport=t,
    )
    b.submit(_shard_dir(tmp_path, n=1), str(tmp_path / "out"), {})
    m, url, h, _ = t.calls[0]
    assert url == (
        "https://myres.openai.azure.com/openai/files"
        "?api-version=2024-02-01"
    )
    assert h["api-key"] == "azkey"
    assert "Authorization" not in h


def test_run_job_polls_then_fetches_results(tmp_path):
    """Full orchestrator lifecycle over the OpenAI wire: submit →
    in_progress poll → completed → results downloaded → manifest
    completed."""
    polls = {"n": 0}

    def handler(method, url, body):
        if url.endswith("/files") and method == "POST":
            return 200, {"id": "file-1"}
        if url.endswith("/batches") and method == "POST":
            return 200, {"id": "batch-1", "status": "validating"}
        if url.endswith("/batches/batch-1"):
            polls["n"] += 1
            s = "in_progress" if polls["n"] < 2 else "completed"
            return 200, {
                "id": "batch-1",
                "status": s,
                "output_file_id": "f-out" if s == "completed" else None,
            }
        if url.endswith("/files/f-out/content"):
            return 200, b'{"custom_id": "request-0"}\n'
        raise AssertionError(url)

    b = OpenAIBatchBackend("sk-test", transport=FakeTransport(handler))
    out = str(tmp_path / "results")
    job = orchestrator.run_job(
        b,
        input_path=_shard_dir(tmp_path, n=1),
        output_path=out,
        manifest_dir=str(tmp_path / "manifests"),
        poll_interval_seconds=0.01,
    )
    assert job.state == "completed"
    assert os.path.exists(os.path.join(out, "batch-1.jsonl"))
    reloaded = orchestrator.JobManifest.load(
        str(tmp_path / "manifests"), job.job_id
    )
    assert reloaded.state == "completed"
    assert reloaded.batch_ids == ["batch-1"]


def test_resume_job_repolls_and_fetches(tmp_path):
    """Crash-after-submit recovery: a submitted manifest + a FRESH
    backend resumes by batch id (no resubmit — no POST calls at all)
    and still downloads results."""
    manifest_dir = str(tmp_path / "manifests")
    job = orchestrator.JobManifest(
        job_id="job-resume",
        input_path="unused",
        output_path=str(tmp_path / "results"),
        state="submitted",
        batch_ids=["batch-7"],
    )
    job.save(manifest_dir)

    def handler(method, url, body):
        assert method == "GET", "resume must never resubmit"
        if url.endswith("/batches/batch-7"):
            return 200, {
                "id": "batch-7",
                "status": "completed",
                "output_file_id": "f-out",
            }
        if url.endswith("/files/f-out/content"):
            return 200, b'{"custom_id": "request-0"}\n'
        raise AssertionError(url)

    b = OpenAIBatchBackend("sk-test", transport=FakeTransport(handler))
    got = orchestrator.resume_job(
        b,
        manifest_dir=manifest_dir,
        job_id="job-resume",
        poll_interval_seconds=0.01,
    )
    assert got.state == "completed"
    assert os.path.exists(
        os.path.join(str(tmp_path / "results"), "batch-7.jsonl")
    )


def test_vertex_submit_gcs_and_status_mapping():
    created = {}

    def handler(method, url, body):
        if url.endswith("/batchPredictionJobs") and method == "POST":
            created.update(json.loads(body))
            return 200, {
                "name": "projects/p1/locations/us-central1/"
                "batchPredictionJobs/123",
                "state": "JOB_STATE_PENDING",
            }
        if "batchPredictionJobs/123" in url and method == "GET":
            return 200, {"state": created.get("__state", "JOB_STATE_RUNNING")}
        raise AssertionError(url)

    t = FakeTransport(handler)
    b = VertexBatchBackend(
        "p1", "gemini-2.0-flash-001", lambda: "tok-1", transport=t
    )
    ids = b.submit("gs://bkt/in/req.jsonl", "gs://bkt/out/", {})
    assert ids == ["projects/p1/locations/us-central1/batchPredictionJobs/123"]
    assert created["model"] == "gemini-2.0-flash-001"
    assert created["inputConfig"] == {
        "instancesFormat": "jsonl",
        "gcsSource": {"uris": ["gs://bkt/in/req.jsonl"]},
    }
    assert created["outputConfig"] == {
        "predictionsFormat": "jsonl",
        "gcsDestination": {"outputUriPrefix": "gs://bkt/out/"},
    }
    m, url, h, _ = t.calls[0]
    assert h["Authorization"] == "Bearer tok-1"
    assert url.startswith(
        "https://us-central1-aiplatform.googleapis.com/v1/projects/p1/"
    )

    assert b.status(ids[0]) == "in_progress"
    created["__state"] = "JOB_STATE_SUCCEEDED"
    assert b.status(ids[0]) == "completed"
    created["__state"] = "JOB_STATE_FAILED"
    assert b.status(ids[0]) == "failed"


def test_vertex_bigquery_io_dispatch():
    def handler(method, url, body):
        return 200, {"name": "projects/p/jobs/1", "state": "JOB_STATE_PENDING"}

    b = VertexBatchBackend(
        "p1", "gemini-2.0-flash-001", lambda: "tok", transport=FakeTransport(handler)
    )
    cfg_in = b._io_config("bq://p1.ds.input", is_input=True)
    assert cfg_in == {
        "instancesFormat": "bigquery",
        "bigquerySource": {"inputUri": "bq://p1.ds.input"},
    }
    cfg_out = b._io_config("bq://p1.ds.output", is_input=False)
    assert cfg_out == {
        "predictionsFormat": "bigquery",
        "bigqueryDestination": {"outputUri": "bq://p1.ds.output"},
    }
    with pytest.raises(ValueError, match="gs:// or bq://"):
        b._io_config("/local/path", is_input=True)


def test_vertex_requires_project():
    with pytest.raises(ValueError, match="project_id"):
        VertexBatchBackend("", "m", lambda: "t")


def test_openai_cancel_hits_cancel_endpoint():
    def handler(method, url, body):
        url = url.split("?")[0]
        if url.endswith("/batches/batch-9/cancel") and method == "POST":
            return 200, {"id": "batch-9", "status": "cancelling"}
        raise AssertionError(f"unexpected {method} {url}")

    t = FakeTransport(handler)
    OpenAIBatchBackend("sk-test", transport=t).cancel("batch-9")
    assert t.paths()[0][0] == "POST"
    assert t.paths()[0][1].endswith("/batches/batch-9/cancel")


def test_vertex_cancel_appends_cancel_verb():
    def handler(method, url, body):
        if url.endswith("batchPredictionJobs/55:cancel") and method == "POST":
            return 200, {}
        raise AssertionError(f"unexpected {method} {url}")

    t = FakeTransport(handler)
    b = VertexBatchBackend(
        "p1", "gemini-2.0-flash-001", lambda: "tok", transport=t
    )
    b.cancel("projects/p1/locations/us-central1/batchPredictionJobs/55")
    assert t.paths()[0][0] == "POST"


def test_cancel_job_cancels_pending_batches_and_marks_manifest(tmp_path):
    from genai_batch_processor_spark.inference import orchestrator

    calls = []

    class PendingBackend:
        def submit(self, input_path, output_path, meta):
            return ["b1", "b2"]

        def status(self, batch_id):
            return "completed" if batch_id == "b1" else "in_progress"

        def cancel(self, batch_id):
            calls.append(batch_id)

    manifest_dir = str(tmp_path / "manifests")
    job = orchestrator.JobManifest(
        job_id="job-x", input_path="in", output_path="out",
        state="submitted", batch_ids=["b1", "b2"],
    )
    job.save(manifest_dir)
    got = orchestrator.cancel_job(
        PendingBackend(), manifest_dir=manifest_dir, job_id="job-x"
    )
    # only the non-terminal batch is cancelled on the provider
    assert calls == ["b2"]
    assert got.state == "cancelled"
    reloaded = orchestrator.JobManifest.load(manifest_dir, "job-x")
    assert reloaded.state == "cancelled"


def test_resume_refuses_cancelled_job(tmp_path):
    """A recorded cancellation is final: resume must not poll the
    provider (whose batches may have finished before the cancel took
    effect) and silently flip the manifest back to completed/failed —
    round-3 ADVICE on orchestrator.cancel_job's docstring promise."""
    from genai_batch_processor_spark.inference import orchestrator

    class ExplodingBackend:
        def status(self, batch_id):
            raise AssertionError("resume touched the provider")

    manifest_dir = str(tmp_path / "manifests")
    job = orchestrator.JobManifest(
        job_id="job-c", input_path="in", output_path="out",
        state="cancelled", batch_ids=["b1"],
    )
    job.save(manifest_dir)
    with pytest.raises(RuntimeError, match="cancelled"):
        orchestrator.resume_job(
            ExplodingBackend(), manifest_dir=manifest_dir, job_id="job-c"
        )
    reloaded = orchestrator.JobManifest.load(manifest_dir, "job-c")
    assert reloaded.state == "cancelled"


def test_azure_preflight_probes_deployment_route(tmp_path):
    """Azure serves chat completions only under the deployment path;
    the deployment-less probe route 404s on the real dataplane."""
    seen = []

    def handler(method, url, body):
        url_path = url.split("?")[0]
        seen.append((method, url_path))
        if "/deployments/my-deploy/chat/completions" in url_path:
            return 200, {"choices": []}
        if url_path.endswith("/files"):
            return 200, {"id": "file-1"}
        if url_path.endswith("/batches"):
            return 200, {"id": "batch-1", "status": "validating"}
        raise AssertionError(f"unexpected {method} {url_path}")

    d = tmp_path / "shards"
    d.mkdir()
    (d / "part-00000.jsonl").write_text(
        json.dumps(
            {
                "custom_id": "request-0",
                "method": "POST",
                "url": "/v1/chat/completions",
                "body": {"model": "my-deploy", "messages": []},
            }
        )
        + "\n"
    )
    b = OpenAIBatchBackend(
        "azure-key",
        azure_endpoint="https://myres.openai.azure.com",
        preflight=True,
        transport=FakeTransport(handler),
    )
    ids = b.submit(str(d), str(tmp_path / "out"), {})
    assert ids == ["batch-1"]
    assert any("/deployments/my-deploy/" in u for _m, u in seen)


def test_submit_reads_partitioned_planned_layout(tmp_path):
    """The shard-planned sink writes shard_key=* subdirectories; the
    backend must recurse into them (one provider file per planned
    shard)."""
    base = tmp_path / "planned"
    for i in range(2):
        d = base / f"shard_key=shard-{i:05d}-000"
        d.mkdir(parents=True)
        (d / "part-00000.txt").write_text(
            json.dumps(
                {
                    "custom_id": f"request-{i}",
                    "method": "POST",
                    "url": "/v1/chat/completions",
                    "body": {"model": "m", "messages": []},
                }
            )
            + "\n"
        )
        (d / "_SUCCESS").write_text("")

    state: dict = {}
    t = FakeTransport(_openai_handler(state))
    b = OpenAIBatchBackend("sk-test", transport=t)
    ids = b.submit(str(base), str(tmp_path / "out"), {})
    assert ids == ["batch-1", "batch-2"]
    assert state["uploads"] == 2


# -- transport retry/backoff (RetryPolicy + _send_with_retries) -----------


class FlakyTransport(FakeTransport):
    """Fails the first ``n_failures`` calls with ``failure`` (an HTTP
    status int or an exception instance), then delegates to the
    handler."""

    def __init__(self, handler, n_failures, failure):
        super().__init__(handler)
        self.n_failures = n_failures
        self.failure = failure

    def request(self, method, url, headers, body=None):
        if self.n_failures > 0:
            self.n_failures -= 1
            self.calls.append((method, url, headers, body))
            if isinstance(self.failure, BaseException):
                raise self.failure
            return self.failure, b"transient"
        return super().request(method, url, headers, body)


def test_submit_survives_transient_503s_with_fresh_boundary(tmp_path):
    """The headline resilience contract: N transient 503s on upload do
    not kill the submit, and every retried upload regenerates its
    multipart boundary."""
    state: dict = {}
    t = FlakyTransport(_openai_handler(state), n_failures=3, failure=503)
    b = OpenAIBatchBackend(
        "sk-test", transport=t, retry_policy=_fast_policy()
    )
    ids = b.submit(_shard_dir(tmp_path, n=1), str(tmp_path / "out"), {})
    assert ids == ["batch-1"]
    upload_bodies = [
        body for m, u, _, body in t.calls if u.split("?")[0].endswith("/files")
    ]
    assert len(upload_bodies) == 4  # 3 failures + 1 success
    boundaries = {body.split(b"\r\n", 1)[0] for body in upload_bodies}
    assert len(boundaries) == 4  # fresh boundary per attempt
    assert state["uploads"] == 1  # the provider accepted exactly one


def test_submit_survives_network_errors_on_upload(tmp_path):
    state: dict = {}
    t = FlakyTransport(
        _openai_handler(state), n_failures=2,
        failure=ConnectionResetError("peer reset"),
    )
    b = OpenAIBatchBackend(
        "sk-test", transport=t, retry_policy=_fast_policy()
    )
    assert b.submit(_shard_dir(tmp_path, n=1), str(tmp_path / "out"), {})
    assert state["uploads"] == 1


def test_batch_create_not_retried_on_503(tmp_path):
    """Batch create is non-idempotent: a 503 (ambiguous server state)
    surfaces immediately — only a definitive 429 rejection retries."""
    state: dict = {}

    def handler(method, url, body):
        url = url.split("?")[0]
        if url.endswith("/files") and method == "POST":
            return 200, {"id": "file-1"}
        if url.endswith("/batches") and method == "POST":
            state["creates"] = state.get("creates", 0) + 1
            return 503, b"unavailable"
        raise AssertionError(url)

    b = OpenAIBatchBackend(
        "sk-test",
        transport=FakeTransport(handler),
        retry_policy=_fast_policy(),
    )
    with pytest.raises(TransportError, match="HTTP 503"):
        b.submit(_shard_dir(tmp_path, n=1), str(tmp_path / "out"), {})
    assert state["creates"] == 1


def test_batch_create_retries_definitive_429(tmp_path):
    state: dict = {"rejects": 2}

    def handler(method, url, body):
        url = url.split("?")[0]
        if url.endswith("/files") and method == "POST":
            return 200, {"id": "file-1"}
        if url.endswith("/batches") and method == "POST":
            if state["rejects"] > 0:
                state["rejects"] -= 1
                return 429, b"rate limited"
            return 200, {"id": "batch-1", "status": "validating"}
        raise AssertionError(url)

    b = OpenAIBatchBackend(
        "sk-test",
        transport=FakeTransport(handler),
        retry_policy=_fast_policy(),
    )
    ids = b.submit(_shard_dir(tmp_path, n=1), str(tmp_path / "out"), {})
    assert ids == ["batch-1"]


def test_http_400_never_retried(tmp_path):
    t = FakeTransport(lambda m, u, bd: (400, b"bad model"))
    b = OpenAIBatchBackend(
        "sk-test", transport=t, retry_policy=_fast_policy()
    )
    with pytest.raises(BadRequest):
        b.status("batch-1")
    assert len(t.calls) == 1


def test_network_error_exhaustion_raises_transport_error(tmp_path):
    t = FlakyTransport(
        lambda m, u, bd: (200, {}), n_failures=99,
        failure=TimeoutError("timed out"),
    )
    b = OpenAIBatchBackend(
        "sk-test", transport=t, retry_policy=_fast_policy(max_attempts=4)
    )
    with pytest.raises(TransportError, match="after 4 attempt"):
        b.status("batch-1")
    assert len(t.calls) == 4


def test_vertex_status_retries_and_refreshes_token(tmp_path):
    tokens = iter(["tok-1", "tok-2", "tok-3"])
    t = FlakyTransport(
        lambda m, u, bd: (200, {"state": "JOB_STATE_SUCCEEDED"}),
        n_failures=2, failure=503,
    )
    b = VertexBatchBackend(
        "proj", "publishers/google/models/gemini-pro",
        lambda: next(tokens), transport=t, retry_policy=_fast_policy(),
    )
    assert b.status("projects/p/locations/l/batchPredictionJobs/1") == (
        "completed"
    )
    # a fresh bearer token was minted for every attempt
    assert [h["Authorization"] for _, _, h, _ in t.calls] == [
        "Bearer tok-1", "Bearer tok-2", "Bearer tok-3",
    ]


def test_retry_policy_delay_honors_retry_after_and_caps():
    p = RetryPolicy(base_delay=0.5, max_delay=30.0, rng=lambda: 1.0)
    assert p.delay(0, "7") == 7.0
    assert p.delay(0, "120") == 30.0        # capped at max_delay
    assert p.delay(0, "-3") == 0.0          # clamped below at zero
    assert p.delay(0, "Wed, 21 Oct 2026 07:28:00 GMT") == 0.5  # date form
    # exponential growth with full jitter in [cap/2, cap]
    assert p.delay(0) == 0.5 and p.delay(2) == 2.0
    lo = RetryPolicy(base_delay=0.5, rng=lambda: 0.0)
    assert lo.delay(2) == 1.0               # cap/2 at rng=0
    assert p.delay(20) == 30.0              # backoff capped at max_delay


def test_fetch_download_retries_transient_failures(tmp_path):
    payload = b'{"custom_id": "request-0"}\n'
    calls = {"n": 0}

    def handler(method, url, body):
        url = url.split("?")[0]
        if url.endswith("/batches/batch-1"):
            return 200, {
                "id": "batch-1", "status": "completed",
                "output_file_id": "f-out",
            }
        if url.endswith("/files/f-out/content"):
            calls["n"] += 1
            if calls["n"] < 3:
                return 502, b"bad gateway"
            return 200, payload
        raise AssertionError(url)

    b = OpenAIBatchBackend(
        "sk-test",
        transport=FakeTransport(handler),
        retry_policy=_fast_policy(),
    )
    out = tmp_path / "out"
    b.fetch("batch-1", str(out))
    assert (out / "batch-1.jsonl").read_bytes() == payload
    assert calls["n"] == 3


def test_run_job_end_to_end_through_a_storm_of_transient_failures(tmp_path):
    """The full orchestrator lifecycle completes even when EVERY wire
    step is hit by transient failures: 503s on upload, a definitive 429
    on batch create, a connection reset mid-poll, and a 502 on the
    result download — the end-to-end proof of the transport retry
    layer, not just per-call units."""
    state = {"upload_fails": 2, "create_429s": 1, "poll_resets": 1,
             "dl_fails": 1, "polls": 0}

    def handler(method, url, body):
        url = url.split("?")[0]
        if url.endswith("/files") and method == "POST":
            if state["upload_fails"] > 0:
                state["upload_fails"] -= 1
                return 503, b"unavailable"
            return 200, {"id": "file-1"}
        if url.endswith("/batches") and method == "POST":
            if state["create_429s"] > 0:
                state["create_429s"] -= 1
                return 429, b"rate limited"
            return 200, {"id": "batch-1", "status": "validating"}
        if url.endswith("/batches/batch-1"):
            if state["poll_resets"] > 0:
                state["poll_resets"] -= 1
                raise ConnectionResetError("peer reset")
            state["polls"] += 1
            s = "in_progress" if state["polls"] < 2 else "completed"
            return 200, {
                "id": "batch-1",
                "status": s,
                "output_file_id": "f-out" if s == "completed" else None,
            }
        if url.endswith("/files/f-out/content"):
            if state["dl_fails"] > 0:
                state["dl_fails"] -= 1
                return 502, b"bad gateway"
            return 200, b'{"custom_id": "request-0"}\n'
        raise AssertionError(url)

    b = OpenAIBatchBackend(
        "sk-test",
        transport=FakeTransport(handler),
        retry_policy=_fast_policy(),
    )
    out = str(tmp_path / "results")
    job = orchestrator.run_job(
        b,
        input_path=_shard_dir(tmp_path, n=1),
        output_path=out,
        manifest_dir=str(tmp_path / "manifests"),
        poll_interval_seconds=0.01,
    )
    assert job.state == "completed"
    assert os.path.exists(os.path.join(out, "batch-1.jsonl"))
    # every injected failure was actually consumed
    assert all(
        state[k] == 0
        for k in ("upload_fails", "create_429s", "poll_resets", "dl_fails")
    )


def test_failed_batch_salvages_error_file_before_raising(tmp_path):
    """A failed batch still carries a provider error file; run_job must
    download it for diagnostics BEFORE raising (the reference reads the
    error file even when status != completed — the one behavior the
    fail-loudly contract was losing)."""
    err_lines = b'{"custom_id": "request-0", "error": {"code": "boom"}}\n'

    def handler(method, url, body):
        url = url.split("?")[0]
        if url.endswith("/files") and method == "POST":
            return 200, {"id": "file-1"}
        if url.endswith("/batches") and method == "POST":
            return 200, {"id": "batch-1", "status": "validating"}
        if url.endswith("/batches/batch-1"):
            return 200, {
                "id": "batch-1",
                "status": "failed",
                "error_file_id": "f-err",
            }
        if url.endswith("/files/f-err/content"):
            return 200, err_lines
        raise AssertionError(url)

    b = OpenAIBatchBackend("sk-test", transport=FakeTransport(handler))
    out = str(tmp_path / "results")
    with pytest.raises(RuntimeError, match="failed"):
        orchestrator.run_job(
            b,
            input_path=_shard_dir(tmp_path, n=1),
            output_path=out,
            manifest_dir=str(tmp_path / "manifests"),
            poll_interval_seconds=0.01,
        )
    salvaged = os.path.join(out, "batch-1.errors.jsonl")
    assert os.path.exists(salvaged)
    assert open(salvaged, "rb").read() == err_lines


def test_protocol_exceptions_from_body_reads_are_retried(tmp_path):
    """http.client.HTTPException (IncompleteRead, BadStatusLine) is not
    an OSError — it must still hit the retry budget, not escape raw
    (round-4 high-effort review finding)."""
    import http.client

    t = FlakyTransport(
        lambda m, u, bd: (200, {"id": "batch-1", "status": "completed"}),
        n_failures=2,
        failure=http.client.IncompleteRead(b"partial"),
    )
    b = OpenAIBatchBackend(
        "sk-test", transport=t, retry_policy=_fast_policy()
    )
    assert b.status("batch-1") == "completed"
    assert len(t.calls) == 3


def test_vertex_delete_treats_404_as_success():
    t = FakeTransport(lambda m, u, bd: (404, b"not found"))
    b = VertexBatchBackend(
        "p1", "publishers/google/models/gemini-pro",
        lambda: "tok", transport=t, retry_policy=_fast_policy(),
    )
    b.delete("projects/p/locations/l/batchPredictionJobs/9")  # no raise
    assert t.paths()[0][0] == "DELETE"
