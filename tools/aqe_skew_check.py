"""AQE skew-join demonstration (round-5 verdict item 6): the same
genuinely-skewed large join run three ways at sf1 —

1. ``plain``    — AQE skew handling OFF: the hot key's partition is one
                  straggler task (the 100 TB failure mode);
2. ``aqe``      — Spark's own adaptive skew-join split ON (thresholds
                  tuned to the local fixture's byte scale; a real
                  cluster keeps the 256 MB defaults): the runtime
                  re-plan splits the oversized partition and the final
                  adaptive plan carries the ``skew=true`` marker this
                  script ASSERTS on;
3. ``salted``   — the manual replicate-broadcast salt
                  (operators/skew.py:salted_join): the remedy for the
                  pathological case AQE cannot split (a single
                  key-group larger than one partition), at the price of
                  exploding the small side.

The skewed fact is the sf1 events table with 40% of rows deterministically
remapped to ONE hot user (operators/skew.py:inject_hot_key — hash of the
unique event_id, so reruns are identical); the dim side is the per-user
profile relation derived from the same table. Row counts of all three
variants are asserted equal — the remedies change the SHUFFLE, never the
result.

Usage: python tools/aqe_skew_check.py [sf1_dir]   (default /tmp/sf1_real)
Appends one JSON line to stdout; human-readable timings to stderr.
The pytest twin (tests/test_plans.py::test_aqe_skew_join_splits_hot_
partition) asserts the plan marker at fixture scale on every run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from genai_batch_processor_spark.operators import skew
from genai_batch_processor_spark.session import get_spark
from genai_batch_processor_spark.sources.tables import load_table


def main() -> None:
    from tools._args import positional

    args = positional(usage="usage: aqe_skew_check.py [sf1_dir]")
    sf1_dir = args[0] if args else "/tmp/sf1_real"
    if not os.path.exists(os.path.join(sf1_dir, "events.parquet")):
        from tools import gen_sf1

        gen_sf1.gen(sf1_dir)
    spark = get_spark("aqe_skew_check")
    events = load_table(spark, sf1_dir, "events")
    import shutil
    import tempfile

    dim_dir = tempfile.mkdtemp(prefix="aqe_skew_dim_")
    dim = skew.build_skew_demo_dim(spark, events, dim_dir)
    results: dict[str, dict] = {}
    groups: dict[str, dict] = {}
    for variant in ("plain", "aqe", "salted"):
        t0 = time.monotonic()
        out = skew.run_skew_demo(spark, events, variant, dim=dim)
        groups[variant] = out["groups"]
        results[variant] = {
            "seconds": round(time.monotonic() - t0, 3),
            "rows": out["rows"],
            "skew_marker_in_final_plan": out["skew_marker"],
        }
        print(f"{variant:8s} {results[variant]}", file=sys.stderr)
    shutil.rmtree(dim_dir, ignore_errors=True)

    # exact per-group (count, weighted-sum) agreement — a remedy that
    # duplicated or dropped rows would still produce the same 5 group
    # keys, so a bare row-count compare could not catch it
    assert groups["plain"] == groups["aqe"] == groups["salted"], (
        "variants disagree on per-group results — a remedy changed "
        "semantics"
    )
    assert results["aqe"]["skew_marker_in_final_plan"], (
        "AQE run's final adaptive plan has no skew-split marker — "
        "the skew join did not engage"
    )
    assert not results["plain"]["skew_marker_in_final_plan"]
    print(json.dumps({"aqe_skew_demo": results, "sf1_dir": sf1_dir}))


if __name__ == "__main__":
    main()
