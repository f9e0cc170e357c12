"""True-sf1 scaling run (round-4 verdict item 3): time the tracked
query set at sf0.1 vs a GENERATED sf1 fixture (tools/gen_sf1.py —
fresh draws from sf0.1's empirical distributions, 10x rows, NOT
replicas) and report ratios.

Replication (tools/scale_check.py → BENCH_SCALE.json) pins near-dup
density constant by construction; this run lets density emerge from
real data growth — the same small-vocabulary shingle space at 10x the
documents, iid unit vectors at 10x the embeddings — which is the
stronger sublinearity claim.

Usage: python tools/sf1_check.py [sf1_dir] [out_json]
(generates the fixture into sf1_dir if it is missing)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
import bench
from genai_batch_processor_spark.session import get_spark
from tools.scale_check import SRC, TOP, timed_leg


def main() -> None:
    from tools._args import positional

    args = positional(usage="usage: sf1_check.py [sf1_dir] [out_json]")
    sf1_dir = args[0] if args else "/tmp/sf1_real"
    out_json = args[1] if len(args) > 1 else "BENCH_SCALE_SF1.json"
    if not os.path.exists(os.path.join(sf1_dir, "lineitem.parquet")):
        from tools import gen_sf1

        t0 = time.monotonic()
        gen_sf1.gen(sf1_dir)
        print(
            f"generated sf1 in {time.monotonic() - t0:.1f}s",
            file=sys.stderr,
        )
    spark = get_spark("sf1_check")
    bench.calibration_workload(spark)  # untimed JIT warm-up
    qs = entrymod.queries()
    results = {}
    recall_row = None
    for name in TOP:
        times = {}
        for label, d in (("sf0.1", SRC), ("sf1", sf1_dir)):
            # Collect BETWEEN timings (same rationale as scale_check):
            # a deferred full GC from an earlier allocation-heavy leg
            # must not land inside this one's wall clock.
            spark._jvm.System.gc()
            # Per-leg calibration bracket (r10 verdict item 7);
            # *_stream legs use the micro-batch latency probe (the
            # compute probe can't see scheduler/checkpoint drift).
            probe = (
                bench.streaming_calibration_workload
                if name.endswith("_stream")
                else bench.calibration_workload
            )
            times[f"calib_{label}"] = probe(spark)
            if name == "part_match_blocking_recall":
                # 1-row audit: collect it here so the recall gate below
                # reads the row this timed execution already produced
                # instead of re-running the quadratic pair-set count.
                t1 = time.monotonic()
                rows = qs[name](spark, d).collect()
                times[label] = round(time.monotonic() - t1, 3)
                n = len(rows)
                if label == "sf1" and rows:
                    recall_row = rows[0]
            else:
                times[label], n = timed_leg(
                    lambda: qs[name](spark, d), name
                )
            times[f"rows_{label}"] = n
        times["ratio"] = round(times["sf1"] / times["sf0.1"], 2)
        if times["calib_sf0.1"] > 0 and times["calib_sf1"] > 0:
            times["ratio_norm"] = round(
                times["ratio"] * times["calib_sf0.1"] / times["calib_sf1"],
                2,
            )
        results[name] = times
        print(
            f"{name:28s} sf0.1={times['sf0.1']:7.2f}s "
            f"sf1={times['sf1']:7.2f}s ratio={times['ratio']:5.1f} "
            f"rows {times['rows_sf0.1']}->{times['rows_sf1']}",
            file=sys.stderr,
        )
    # Round 6: the raise-at-scale contracts are AUTOMATIC (adaptive
    # defaults derived from the corpus — clustering.adaptive_k with
    # the assign_cells_auto Arrow gate, dedup.adaptive_max_bucket,
    # linkage.adaptive_max_block). The round-5 run's zero-row cases
    # must now be NON-EMPTY with no caller-supplied knobs; fail loudly
    # if a default degrades back to a silently-empty report.
    # Per-query degenerate-result predicate: the pair generators fail
    # degenerate as ZERO rows, but semdedup_survivors fails degenerate
    # as a FULL-size result (every doc survives when oversized cells
    # drop — the operator is an anti-join, never empty), so its guard
    # checks that it actually REMOVED something.
    n_emb = (
        spark.read.parquet(os.path.join(sf1_dir, "embeddings.parquet"))
        .count()
    )
    degenerate = {
        "simhash_near_dup": lambda r: r == 0,
        "part_match_candidates": lambda r: r == 0,
        "part_match_multikey": lambda r: r == 0,
        # the recall audit must certify the multi-pass union lost
        # nothing: its one row is checked for recall via rows==1 here
        # and recall_milli==1000 below
        "part_match_blocking_recall": lambda r: r != 1,
        "semdedup_survivors": lambda r: r == 0 or r >= n_emb,
        # round-7: the ANN-ingest probe joins the gate (round-6 verdict
        # item 1) — the re-ingest construction guarantees every batch
        # vector has at least its exact twin in the index, so an empty
        # pair set at sf1 means a degenerate adaptive-k/cap default
        "incremental_embedding_near_dup": lambda r: r == 0,
    }
    # a guarded name MISSING from results is itself a regression (a
    # rename or a TOP-list edit silently disabling the gate), not a
    # skip — fail loudly either way
    broken = [
        n
        for n, is_bad in degenerate.items()
        if n not in results or is_bad(results[n]["rows_sf1"])
    ]
    if broken:
        print(
            f"ADAPTIVE-DEFAULT REGRESSION: degenerate sf1 results for "
            f"{sorted(broken)}",
            file=sys.stderr,
        )
        sys.exit(1)
    print(
        "adaptive defaults non-degenerate at sf1: "
        + ", ".join(
            f"{n}={results[n]['rows_sf1']}"
            for n in sorted(degenerate)
            if n in results
        )
        + f" (embeddings={n_emb})",
        file=sys.stderr,
    )
    # The multi-pass recall contract, asserted ON sf1 data (round-6
    # verdict item 4): the band-pass union must not lose a single pair
    # the coarse block finds — recall_milli is exactly 1000 by the
    # band-partition proof, so anything less is a blocking regression.
    recall = recall_row
    if recall is None:
        print(
            "MULTI-PASS RECALL GATE DID NOT RUN: "
            "part_match_blocking_recall missing from TOP or empty",
            file=sys.stderr,
        )
        sys.exit(1)
    if recall["recall_milli"] != 1000:
        print(
            f"MULTI-PASS RECALL REGRESSION at sf1: {recall.asDict()}",
            file=sys.stderr,
        )
        sys.exit(1)
    results["part_match_blocking_recall"]["recall_sf1"] = recall.asDict()
    print(
        f"multi-pass blocking recall at sf1: {recall.asDict()}",
        file=sys.stderr,
    )

    # Candidate-generation families over a FIXED key space (4x256
    # simhash cells; ~400 (brand, noun) part blocks) have bucket
    # population ∝ corpus, so their candidate VOLUME is quadratic in
    # the scale factor BY DESIGN — cap-bounded, but not a linear-work
    # query. In rounds 1-5 their fixed caps hid this by dropping every
    # bucket (zero rows, fast); the adaptive caps restore the real
    # work, so judge them on produced-pair throughput, not wall ratio.
    # part_match_blocking_recall COUNTS two quadratic-by-design pair
    # relations (its wall time scales with pair volume even though its
    # output is one row), so it is excluded from the sublinear verdict
    # with the generators it audits — but gets no pairs/sec annotation
    # (its row count is 1, not a pair volume).
    pair_generators = {
        "simhash_near_dup",
        "part_match_candidates",
        "part_match_multikey",
    }
    quadratic_by_design = pair_generators | {"part_match_blocking_recall"}
    for n in pair_generators & set(results):
        r = results[n]
        if r["rows_sf1"] and r["sf1"]:
            r["pairs_per_sec_sf1"] = round(r["rows_sf1"] / r["sf1"], 1)
        if r["rows_sf0.1"] and r["sf0.1"]:
            r["pairs_per_sec_sf0.1"] = round(
                r["rows_sf0.1"] / r["sf0.1"], 1
            )
    max_ratio = max(
        (
            r["ratio"]
            for n, r in results.items()
            if "ratio" in r and n not in quadratic_by_design
        ),
        default=float("nan"),
    )
    verdict = (
        "sublinear throughout (every linear-volume ratio < 10x rows)"
        if results and max_ratio < 10
        else "NOT sublinear - inspect queries with ratio >= 10"
    )
    payload = {
        "factor": 10,
        "mode": "generated",
        "notes": (
            "TRUE sf1 (tools/gen_sf1.py seed 421): fresh draws from "
            "sf0.1's empirical distributions, not replicas — near-dup "
            "density emerges from the data. Max ratio "
            f"{max_ratio}x vs 10x rows - {verdict}. Row-count deltas vs "
            "sf0.1 are expected: result cardinalities are "
            "distribution-dependent (pair counts, top-k recalls), and "
            "the timing, not the counts, is what this run pins. "
            "Round 6: semdedup_survivors, simhash_near_dup and "
            "part_match_candidates run with CORPUS-DERIVED defaults "
            "(clustering.adaptive_k + the assign_cells_auto Arrow "
            "gate, dedup.adaptive_max_bucket, "
            "linkage.adaptive_max_block) and this run asserts they are "
            "non-empty at sf1 with no caller-supplied knobs — the "
            "round-5 silent-zero failure mode is now a loud exit(1). "
            "Round 7: the gate extends to the ANN-ingest probe "
            "(incremental_embedding_near_dup non-empty) and the "
            "multi-pass blocking recall audit (recall_milli must be "
            "exactly 1000 on sf1 data — the band-pass union provably "
            "loses nothing the coarse block finds). The part_match "
            "family's OUTPUT volume is still quadratic in corpus "
            "density by design (256 distinct names over 200k rows — "
            "most pairs are identical-name pairs no blocking can "
            "remove), so those entries carry pairs_per_sec; but the "
            "round-7 score-names-expand-to-rows rewrite (Levenshtein "
            "once per distinct in-block name pair, row pairs recovered "
            "by join fan-out) makes the WALL output-bound: sf1 "
            "part_match_candidates dropped from 67s to ~3s at "
            "identical output."
        ),
        "queries": results,
    }
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_json}", file=sys.stderr)


if __name__ == "__main__":
    main()
