"""Isolated idle A/B of single queries across two checkouts.

The round-5/round-8 discipline as a tool instead of an ad-hoc script:
run ONE query per fresh Spark process (no shared-stage session caches,
no sweep-order effects), interleaved A/B/A/B so box drift hits both
sides equally, with the bench calibration workload bracketing every
run so a loaded box is visible in the artifact. Reports per-side raw
and calibration-normalized medians/mins.

Usage:
    python tools/ab_isolated.py <repo_a> <repo_b> <query> [reps] [sf]

repo_a / repo_b are repo roots (HEAD checkout and a `git worktree add`
of the comparison revision). The child re-execs THIS file with --child,
pointing sys.path at the target root, so both sides run their own
bench.py + registry.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

# Fallback only (r12 ADVICE): the live reference is read from the
# committed freeze at runtime so a baseline re-freeze can't silently
# skew absolute norm values (the b/a ratio never depended on it).
CALIB_REF_FALLBACK = 0.906  # BENCH_r11.json calib_ref_sec


def calib_ref() -> tuple[float, str]:
    """(calib_ref_sec, source): BASELINE_QUERIES.json's frozen
    calibration if present, else the hard-coded fallback."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "BASELINE_QUERIES.json")
    try:
        with open(path) as f:
            ref = json.load(f).get("calib_ref_sec")
        if ref:
            return float(ref), "BASELINE_QUERIES.json"
    except (OSError, ValueError):
        pass
    return CALIB_REF_FALLBACK, "fallback-constant"


def child(root: str, query: str, sf: str) -> None:
    sys.path.insert(0, root)
    import bench  # noqa: E402 — the target checkout's bench
    import __spark_entry__ as entry  # noqa: E402

    from genai_batch_processor_spark.session import get_spark

    spark = get_spark("ab-isolated")
    bench.calibration_workload(spark)  # untimed JIT warm-up (fresh JVM)
    calib = bench.calibration_workload(spark)
    t0 = time.monotonic()
    # noop sink, NOT count(): Catalyst prunes Project-only work
    # (ArrowEvalPython included) under count() — the repo's documented
    # hazard (tools/scale_check.py FORCE_MATERIALIZE) — and bench.py
    # times via the same sink, so A/B numbers stay bench-comparable.
    df = entry.queries()[query](spark, sf)
    df.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    n = df.count()  # after the clock: a second, possibly pruned, pass
    print(json.dumps({"calib": round(calib, 3), "sec": round(dt, 3), "rows": n}))


def run_side(root: str, query: str, sf: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", root, query, sf],
        capture_output=True,
        text=True,
        timeout=600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"{root}: {out.stderr[-2000:]}")
    # last JSON line, skipping Spark banners/log noise on stdout
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            try:
                return json.loads(line)
            except ValueError:
                continue
    raise RuntimeError(
        f"{root}: child exited 0 with no JSON line; "
        f"stdout tail: {out.stdout[-500:]!r} stderr: {out.stderr[-500:]!r}"
    )


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], sys.argv[4])
        return
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    repo_a, repo_b, query = sys.argv[1:4]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    sf = sys.argv[5] if len(sys.argv) > 5 else "/root/testdata/sf0.1"
    ref, ref_source = calib_ref()
    samples: dict[str, list[dict]] = {"a": [], "b": []}
    for rep in range(reps):
        for side, root in (("a", repo_a), ("b", repo_b)):
            r = run_side(root, query, sf)
            r["norm"] = round(r["sec"] * ref / r["calib"], 3)
            samples[side].append(r)
            print(
                f"rep{rep} {side} sec={r['sec']} calib={r['calib']} "
                f"norm={r['norm']} rows={r['rows']}",
                file=sys.stderr,
            )
    result = {"query": query, "reps": reps, "sf": sf,
              "repo_a": repo_a, "repo_b": repo_b,
              "calib_ref_sec": ref, "calib_ref_source": ref_source}
    for side in ("a", "b"):
        secs = [r["sec"] for r in samples[side]]
        norms = [r["norm"] for r in samples[side]]
        result[side] = {
            "raw_median": round(statistics.median(secs), 3),
            "raw_min": min(secs),
            "norm_median": round(statistics.median(norms), 3),
            "norm_min": min(norms),
            "calibs": [r["calib"] for r in samples[side]],
            "rows": samples[side][0]["rows"],
        }
    result["norm_median_ratio_b_over_a"] = round(
        result["b"]["norm_median"] / result["a"]["norm_median"], 3
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
