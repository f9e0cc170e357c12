"""Economics of the distributed shard upload (r10 verdict item 4).

``submit_spark`` is correctness-proven (wire-identical to the
sequential path under injected 503s — tests/test_resilience.py), but
"the last driver-sequential data-plane bottleneck is gone" deserves a
NUMBER, like ``fetch_results_spark`` got in round 6. This harness
builds ~100 JSONL shards (the scale ``batch_shards`` plans by design),
runs the sequential ``submit`` and the distributed ``submit_spark``
against the SAME stub transport, and reports wall clock + shards/sec
for both.

The stub transport sleeps ``LATENCY_MS`` per files.create to model the
provider upload RTT — the quantity the distributed path actually
parallelizes. Two legs: latency=0 exposes the Spark stage overhead
floor (where sequential wins — documented, not hidden), and
latency=100ms models a realistic cross-region upload. Batch creates
are driver-side sequential in BOTH paths (non-idempotent by design),
so the delta isolates the upload stage. Per-leg ``calib_sec`` (the
shared bench calibration workload, r10 verdict item 7) brackets each
timing so a loaded box can't fake a ratio.

Usage:  python tools/submit_scale_check.py [n_shards] [out_json]
Writes one JSON line; paste the summary into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LATENCY_MS = 100
N_SHARDS = 96
REQS_PER_SHARD = 200


def _stub_transport_cls():
    """Defined in a function so cloudpickle ships it BY VALUE to
    executors (same pattern as the golden-wire test transports)."""

    class StubUploadTransport:
        def __init__(self, latency_ms: float):
            self.latency_ms = latency_ms

        def request(self, method, url, headers, body=None):
            import json as _json
            import re as _re
            import time as _time

            path = url.split("/v1", 1)[1].split("?")[0]
            if path == "/files":
                if self.latency_ms:
                    _time.sleep(self.latency_ms / 1000.0)
                name = _re.search(
                    rb'filename="([^"]+)"', body or b""
                ).group(1).decode()
                return 200, _json.dumps({"id": f"file-{name}"}).encode(), {}
            if path == "/batches" and method == "POST":
                fid = _json.loads(body)["input_file_id"]
                return 200, _json.dumps(
                    {"id": f"batch-{fid}", "status": "validating"}
                ).encode(), {}
            raise AssertionError(f"unexpected wire call: {method} {path}")

    return StubUploadTransport


def build_shards(base: str, n: int, reqs: int) -> str:
    shard_dir = os.path.join(base, "shards")
    os.makedirs(shard_dir, exist_ok=True)
    line = (
        '{"custom_id": "request-%d", "method": "POST", '
        '"url": "/v1/chat/completions", "body": {"model": "m", '
        '"messages": [{"role": "user", "content": "classify this '
        'document text please and respond with one label"}]}}\n'
    )
    for s in range(n):
        with open(
            os.path.join(shard_dir, f"part-{s:05d}.jsonl"), "w"
        ) as f:
            for r in range(reqs):
                f.write(line % (s * reqs + r))
    return shard_dir


def main() -> None:
    from tools._args import positional

    args = positional(usage="usage: submit_scale_check.py [n_shards] [out]")
    n_shards = int(args[0]) if args else N_SHARDS
    out_json = args[1] if len(args) > 1 else "BENCH_SUBMIT.json"

    import tempfile

    import bench
    from genai_batch_processor_spark.inference import providers
    from genai_batch_processor_spark.session import get_spark

    spark = get_spark("submit_scale_check")
    base = tempfile.mkdtemp(prefix="submit_scale_")
    shard_dir = build_shards(base, n_shards, REQS_PER_SHARD)
    shard_bytes = sum(
        os.path.getsize(os.path.join(shard_dir, f))
        for f in os.listdir(shard_dir)
    )
    transport_cls = _stub_transport_cls()
    policy = providers.RetryPolicy(
        max_attempts=3, base_delay=0.0, max_delay=0.0
    )

    results: dict = {
        "n_shards": n_shards,
        "reqs_per_shard": REQS_PER_SHARD,
        "total_mb": round(shard_bytes / 1e6, 1),
        "legs": {},
    }
    # Warm the JVM AND the Python workers once (mapInPandas spawns
    # python daemons on first use — ~2s one-time cost that would
    # otherwise land entirely in the first distributed leg and misstate
    # the steady-state overhead floor).
    spark.range(1000).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    for latency_ms in (0, LATENCY_MS):
        leg: dict = {"latency_ms": latency_ms}
        for mode in ("sequential", "distributed"):
            backend = providers.OpenAIBatchBackend(
                api_key="stub",
                transport=transport_cls(latency_ms),
                retry_policy=policy,
            )
            calib = bench.calibration_workload(spark)
            t0 = time.perf_counter()
            if mode == "sequential":
                ids = backend.submit(shard_dir, "unused", {})
            else:
                ids = [
                    r["batch_id"]
                    for r in backend.submit_spark(
                        spark, shard_dir, "unused", {}
                    )
                ]
            dt = time.perf_counter() - t0
            assert len(ids) == n_shards
            leg[mode] = {
                "sec": round(dt, 3),
                "shards_per_sec": round(n_shards / dt, 1),
                "calib_sec": calib,
            }
        leg["speedup"] = round(
            leg["sequential"]["sec"] / leg["distributed"]["sec"], 2
        )
        results["legs"][f"latency_{latency_ms}ms"] = leg
        print(
            f"latency={latency_ms}ms: seq {leg['sequential']['sec']}s "
            f"({leg['sequential']['shards_per_sec']}/s) vs dist "
            f"{leg['distributed']['sec']}s "
            f"({leg['distributed']['shards_per_sec']}/s) -> "
            f"{leg['speedup']}x",
            file=sys.stderr,
        )

    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))

    import shutil

    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
