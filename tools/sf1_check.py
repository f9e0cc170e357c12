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
from genai_batch_processor_spark.session import get_spark
from tools.scale_check import SRC, TOP


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_real"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SCALE_SF1.json"
    if not os.path.exists(os.path.join(sf1_dir, "lineitem.parquet")):
        from tools import gen_sf1

        t0 = time.monotonic()
        gen_sf1.gen(sf1_dir)
        print(
            f"generated sf1 in {time.monotonic() - t0:.1f}s",
            file=sys.stderr,
        )
    spark = get_spark("sf1_check")
    qs = entrymod.queries()
    results = {}
    for name in TOP:
        times = {}
        for label, d in (("sf0.1", SRC), ("sf1", sf1_dir)):
            t1 = time.monotonic()
            n = qs[name](spark, d).count()
            times[label] = round(time.monotonic() - t1, 3)
            times[f"rows_{label}"] = n
        times["ratio"] = round(times["sf1"] / times["sf0.1"], 2)
        results[name] = times
        print(
            f"{name:28s} sf0.1={times['sf0.1']:7.2f}s "
            f"sf1={times['sf1']:7.2f}s ratio={times['ratio']:5.1f} "
            f"rows {times['rows_sf0.1']}->{times['rows_sf1']}",
            file=sys.stderr,
        )
    # The raise-k-at-scale contract, demonstrated: semdedup's default
    # k=8 cells hold ~2500 members at sf1 — past SEMDEDUP_MAX_CELL, so
    # the drop guard zeroes the operator (the documented behavior, and
    # what the row count above shows). The published contract says
    # raise k with the corpus (Abbas et al. used 50k cells on LAION);
    # k=80 restores sf0.1's ~250-member cell population at sf1.
    from pyspark.sql import functions as F  # noqa: N812

    from genai_batch_processor_spark import queries as q
    from genai_batch_processor_spark.operators import (
        clustering,
        similarity,
    )
    from genai_batch_processor_spark.sources.tables import load_table

    t1 = time.monotonic()
    emb = load_table(spark, sf1_dir, "embeddings")
    cents = clustering.centroids_from_cells(
        clustering.kmeans_cells(emb, k=80, arrow=True)
    )
    assigned = clustering.assign_cells_arrow(emb, cents).persist()
    pairs = similarity.embedding_near_dup_pairs(
        assigned, bucket_col="cell", max_cell=q.SEMDEDUP_MAX_CELL
    )
    survivors = q._embedding_survivors(emb, pairs)
    n_surv, n_all = survivors.count(), emb.count()
    assigned.unpersist()
    results["semdedup_survivors_k80_sf1"] = {
        "sf1": round(time.monotonic() - t1, 3),
        "rows_sf1": n_surv,
        "note": (
            f"raise-k contract at sf1 via the assign_cells_arrow "
            f"large-k path: k=80 cells -> {n_all - n_surv} of {n_all} "
            "removed (default k=8 cells exceed the 512-member cap and "
            "drop, the guard behavior; the literal-centroid argmin "
            "took 159 s at k=80 - codegen grows with k - hence the "
            "Arrow twin, property-tested to agree)"
        ),
    }
    print(
        f"semdedup k=80 at sf1: {results['semdedup_survivors_k80_sf1']}",
        file=sys.stderr,
    )

    max_ratio = max(
        (r["ratio"] for r in results.values() if "ratio" in r),
        default=float("nan"),
    )
    verdict = (
        "sublinear throughout (every ratio < 10x rows)"
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
            "Zero-row cases at sf1 (simhash_near_dup, "
            "part_match_candidates, semdedup with default k) are the "
            "skew/cell caps operating as documented on 10x-denser "
            "buckets; semdedup_survivors_k80_sf1 demonstrates the "
            "documented remedy (raise k with the corpus) restoring the "
            "operator at scale."
        ),
        "queries": results,
    }
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_json}", file=sys.stderr)


if __name__ == "__main__":
    main()
