"""Opt-in LIVE-WIRE smoke harness (round-6 verdict item 6).

The 11 golden transcripts under tests/golden/ pin the provider wire
formats byte-for-byte, but a wrongly-RECORDED transcript stays wrong
forever — only a real endpoint can falsify the recording. This script
runs the preflight probe plus a tiny 2-row batch submit against a live
provider and diffs the OBSERVED request sequence's shape (method, path,
content-type, body top-level keys) against the golden recordings.

Strictly opt-in, zero CI effect:
- OpenAI leg runs only when ``OPENAI_API_KEY`` is set.
- Vertex leg runs only when ``VERTEX_PROJECT_ID`` AND
  ``GOOGLE_BEARER_TOKEN`` (e.g. ``gcloud auth print-access-token``)
  are set — plus ``VERTEX_GCS_PREFIX`` (a gs:// scratch prefix the
  token may write) because Vertex reads batch input server-side.
- With neither configured (this sandbox) it prints SKIP and exits 0.

A live batch can take up to the provider's completion window (24h), so
the poll loop is capped at ``LIVE_SMOKE_POLL_S`` (default 120 s); if
the batch hasn't completed by then it is CANCELLED (cleanup — the
submit/status wire shapes have already been validated by that point)
and the fetch-shape check is reported as NOT REACHED rather than
failed.

Usage:  OPENAI_API_KEY=... python tools/live_smoke.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from urllib.parse import urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from genai_batch_processor_spark.inference import providers

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
)


class RecordingTransport:
    """Wraps the real transport; keeps (method, url, headers, body) of
    every request and the (status, body) of every response, in order —
    the same shape the golden recorder used, so the two transcripts
    diff like-for-like."""

    def __init__(self, inner=None):
        self.inner = inner or providers.UrllibTransport()
        self.requests: list[dict] = []
        self.responses: list[dict] = []

    def request(self, method, url, headers, body=None):
        self.requests.append(
            {
                "method": method,
                "url": url,
                "headers": dict(headers),
                "body": None if body is None else body.decode(
                    errors="replace"
                ),
            }
        )
        out = self.inner.request(method, url, headers, body)
        status, raw = out[0], out[1]
        try:
            parsed = json.loads(raw) if raw else None
        except ValueError:
            parsed = raw[:200].decode(errors="replace")
        self.responses.append({"status": status, "body": parsed})
        return out


def request_shape(req: dict) -> dict:
    """The engine-controlled shape of one wire request: method, URL
    path (host- and id-normalized), content type, and the top-level
    body keys. Values (keys, ids, prompts) differ per run; the SHAPE
    is what the goldens pin."""
    path = urlparse(req["url"]).path
    # Normalize provider-assigned ids POSITIONALLY (the segment after a
    # collection segment) so live paths match recorded ones. Prefix
    # matching ("file-", "batch_") would miss the goldens' own ids
    # ("f-out", "batch-1"), and request_shape runs on BOTH transcripts.
    raw = path.split("/")
    collections = {"batches", "files", "batchPredictionJobs",
                   "projects", "locations"}

    def norm(i: int, p: str) -> str:
        # Keep a Vertex-style ':verb' suffix ('123:cancel' →
        # '{id}:cancel'), else cancel and get/fetch collapse to the
        # same '{id}' shape and only the HTTP method separates them.
        stem, sep, verb = p.partition(":")
        if stem.isdigit() or (
            i > 0
            and raw[i - 1].partition(":")[0] in collections
            and stem not in ("cancel", "content")
        ):
            return "{id}" + sep + verb
        return p

    parts = [norm(i, p) for i, p in enumerate(raw)]
    ctype = next(
        (v for k, v in req["headers"].items()
         if k.lower() == "content-type"),
        None,
    )
    body = req.get("body")
    if body and ctype and "multipart" in ctype:
        body_keys = ["<multipart: purpose,file>"]
        ctype = "multipart/form-data"
    elif body:
        try:
            body_keys = sorted(json.loads(body))
        except ValueError:
            body_keys = ["<non-json>"]
    else:
        body_keys = []
    return {
        "method": req["method"],
        "path": "/".join(parts),
        "content_type": ctype,
        "body_keys": body_keys,
    }


def golden_shapes(name: str) -> list[dict]:
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return [request_shape(r) for r in json.load(f)["requests"]]


def diff_shapes(observed: list[dict], golden: list[dict], label: str) -> bool:
    """Compare the observed request sequence against the golden one,
    position by position, up to the shorter length (a live run may
    stop early at the poll cap). Returns True when they agree."""
    ok = True
    for i, (o, g) in enumerate(zip(observed, golden)):
        if o != g:
            ok = False
            print(f"  SHAPE DIFF [{label} #{i}]")
            print(f"    observed: {o}")
            print(f"    golden:   {g}")
    if ok:
        print(
            f"  {label}: {min(len(observed), len(golden))} request "
            "shapes match the goldens"
        )
    return ok


def run_openai() -> bool:
    model = os.environ.get("LIVE_SMOKE_MODEL", "gpt-4o-mini")
    poll_cap = float(os.environ.get("LIVE_SMOKE_POLL_S", "120"))
    rec = RecordingTransport()
    # preflight=False: the probe is issued EXPLICITLY below so the
    # observed sequence matches the golden's [chat, files, batches];
    # preflight=True would have submit() validate a second time — an
    # extra paid completion and a guaranteed positional shape diff.
    backend = providers.OpenAIBatchBackend(preflight=False, transport=rec)

    print("== OpenAI live smoke ==")
    # 1. preflight: one real sync completion (oai:92-125 analog)
    backend.validate(
        {
            "model": model,
            "messages": [{"role": "user", "content": "reply with: ok"}],
            "max_tokens": 4,
        }
    )
    print(f"  preflight ok ({rec.responses[-1]['status']})")

    # 2. tiny 2-row batch through the real Files+Batches flow
    workdir = tempfile.mkdtemp(prefix="live_smoke_")
    shard = os.path.join(workdir, "part-00000.jsonl")
    with open(shard, "w") as f:
        for i in range(2):
            f.write(
                json.dumps(
                    {
                        "custom_id": f"request-{i}",
                        "method": "POST",
                        "url": "/v1/chat/completions",
                        "body": {
                            "model": model,
                            "messages": [
                                {
                                    "role": "user",
                                    "content": f"reply with: {i}",
                                }
                            ],
                            "max_tokens": 4,
                        },
                    }
                )
                + "\n"
            )
    out_dir = os.path.join(workdir, "out")
    batch_ids = backend.submit(workdir, out_dir, meta={})
    print(f"  submitted {batch_ids}")

    # 3. bounded poll; cancel on timeout (cleanup, not failure)
    t0 = time.monotonic()
    fetched = False
    while time.monotonic() - t0 < poll_cap:
        state = backend.status(batch_ids[0])
        if state == "completed":
            backend.fetch(batch_ids[0], out_dir)
            n = sum(
                1
                for fn in os.listdir(out_dir)
                for line in open(os.path.join(out_dir, fn))
                if line.strip()
            )
            print(f"  completed; fetched {n} result lines")
            fetched = True
            break
        if state in ("failed", "cancelled", "expired"):
            print(f"  batch terminal without output: {state}")
            break
        time.sleep(5)
    else:
        backend.cancel(batch_ids[0])
        print(
            f"  poll cap {poll_cap}s hit — batch cancelled; fetch shape "
            "NOT REACHED (submit/status shapes validated)"
        )

    # 4. uploaded-shard GC (live resource hygiene + validates the
    # files.delete wire against its golden): the input file id comes
    # off the batch resource, deletion is 404-idempotent. Terminal-only
    # (r10 ADVICE): after a poll-cap cancel the batch may sit in
    # 'cancelling' with in-flight requests still READING the input —
    # the same hazard gc_job_files refuses for non-terminal jobs — so
    # skip GC unless one post-cancel status read comes back terminal.
    deleted_shape = None
    try:
        # status() collapses every pending wire state (validating /
        # finalizing / cancelling / in_progress) to 'in_progress'.
        state = backend.status(batch_ids[0])
        if state == "in_progress":
            print(
                f"  input-file GC skipped: batch still {state!r} "
                "(non-terminal after cancel; provider may read input)"
            )
        else:
            fid = backend._call("GET", f"/batches/{batch_ids[0]}").get(
                "input_file_id"
            )
            if fid:
                n_before = len(rec.requests)
                backend.delete_file(fid)
                deleted_shape = [
                    request_shape(r) for r in rec.requests[n_before:]
                ]
                print(f"  deleted input file {fid}")
    except Exception as e:  # noqa: BLE001 — cleanup must not fail smoke
        print(f"  input-file GC skipped: {e}")

    observed = [request_shape(r) for r in rec.requests]
    golden = golden_shapes("openai_preflight.json")
    ok = diff_shapes(observed, golden, "openai preflight+submit")
    if deleted_shape:
        gold_del = [
            s
            for s in golden_shapes("openai_file_delete.json")
            if s["method"] == "DELETE"
        ]
        ok &= diff_shapes(deleted_shape[:1], gold_del[:1], "openai delete")
    if fetched:
        # poll/fetch tail: compare against the poll-fetch golden's
        # GET shapes (ignore count — live polls vary)
        tail = [s for s in observed if s["method"] == "GET"]
        gold_tail = [
            s
            for s in golden_shapes("openai_poll_fetch_cancel.json")
            if s["method"] == "GET"
        ]
        ok &= diff_shapes(tail[:1], gold_tail[:1], "openai poll")
        ok &= diff_shapes(tail[-1:], gold_tail[-1:], "openai fetch")
    return ok


def run_vertex() -> bool:
    project = os.environ["VERTEX_PROJECT_ID"]
    token = os.environ["GOOGLE_BEARER_TOKEN"]
    prefix = os.environ.get("VERTEX_GCS_PREFIX")
    if not prefix:
        print("== Vertex live smoke: SKIP (no VERTEX_GCS_PREFIX) ==")
        return True
    print("== Vertex live smoke ==")
    rec = RecordingTransport()
    backend = providers.VertexBatchBackend(
        project_id=project,
        model=os.environ.get("LIVE_SMOKE_VERTEX_MODEL", "gemini-1.5-flash"),
        token_provider=lambda: token,
        transport=rec,
    )
    # submit against a caller-staged gs:// input (the sink writes
    # gs:// only when cloud connectors exist on the classpath, so the
    # 2-row input must be staged by the operator running this script)
    job = backend.submit(prefix + "/input", prefix + "/output", meta={})
    print(f"  submitted {job}")
    state = backend.status(job[0])
    print(f"  first status: {state}")
    observed = [request_shape(r) for r in rec.requests]
    return diff_shapes(
        observed, golden_shapes("vertex_submit_gcs.json"), "vertex submit"
    )


def main() -> int:
    ran = False
    ok = True
    if os.environ.get("OPENAI_API_KEY"):
        ran = True
        ok &= run_openai()
    if os.environ.get("VERTEX_PROJECT_ID") and os.environ.get(
        "GOOGLE_BEARER_TOKEN"
    ):
        ran = True
        ok &= run_vertex()
    if not ran:
        print(
            "SKIP: no live credentials (set OPENAI_API_KEY and/or "
            "VERTEX_PROJECT_ID + GOOGLE_BEARER_TOKEN to run) — this "
            "sandbox has no network; the harness exists for the day "
            "one does."
        )
        return 0
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
