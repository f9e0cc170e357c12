"""Freeze per-query bench baselines (round-7 verdict item 3): turn an
IDLE bench run's side file (BENCH_PLANS.json) into
BASELINE_QUERIES.json — the per-query 2x gate bench.py enforces from
then on.

The frozen reference is the run's own calibration median
(``calib_ref_sec``) plus its per-query min-of-reps. Because the freeze
run IS the reference box state, its raw mins are by definition its
normalized mins; later runs rescale their samples by
``calib_ref / calib_rep`` before comparing, so the gate fires on code
regressions, not box drift.

Run ONLY on an idle box (check uptime/load first), after a full
3-rep sf0.1 bench:

    python bench.py            # writes BENCH_PLANS.json
    python tools/freeze_baseline.py [note]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    note = sys.argv[1] if len(sys.argv) > 1 else ""
    with open(os.path.join(ROOT, "BENCH_PLANS.json")) as f:
        side = json.load(f)
    calib = side.get("calib_reps") or []
    if not calib:
        raise SystemExit(
            "BENCH_PLANS.json has no calib_reps — re-run bench.py "
            "(round-8+) first"
        )
    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load = None
    calib_ref = round(statistics.median(calib), 3)
    # Streaming-family probe (round-9 verdict item 3): *_stream queries
    # normalize by the micro-batch latency probe, everything else by
    # the shuffle+agg probe. A pre-r10 side file has no stream reps —
    # streams then fall back to the compute factor (old behavior).
    calib_stream = side.get("calib_stream_reps") or []
    calib_stream_ref = (
        round(statistics.median(calib_stream), 3) if calib_stream else None
    )
    import bench

    def _factors(name: str) -> list[float]:
        if name.endswith(bench.STREAM_SUFFIX) and calib_stream_ref:
            return [
                (calib_stream_ref / c) if c > 0 else 1.0
                for c in calib_stream
            ]
        return [(calib_ref / c) if c > 0 else 1.0 for c in calib]

    # TRUE normalized mins: rescale each rep's sample by that rep's own
    # factor BEFORE taking the min — freezing raw mins would bake the
    # freeze run's own between-rep drift into the gate (a min that came
    # from a slow rep sits below its true normalized value and fires
    # the flag early near the boundary).
    mins_norm = {
        name: round(
            min(t * _factors(name)[i] for i, t in enumerate(reps)),
            3,
        )
        for name, reps in side["query_reps"].items()
    }
    out = {
        "sf": side.get("sf", 0.1),
        "calib_ref_sec": calib_ref,
        "calib_reps": calib,
        "calib_stream_ref_sec": calib_stream_ref,
        "calib_stream_reps": calib_stream,
        "query_mins_norm": mins_norm,
        "note": note,
        "load_avg_at_freeze": load,
    }
    path = os.path.join(ROOT, "BASELINE_QUERIES.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(
        f"froze {len(out['query_mins_norm'])} query baselines, "
        f"calib_ref_sec={out['calib_ref_sec']} -> {path}"
    )


if __name__ == "__main__":
    main()
