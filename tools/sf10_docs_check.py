"""sf10 tail evidence for the two worst scalers (round-7 verdict
item 8): `simhash_near_dup` (8.03x @ 10x) and `ngram_jaccard`
(7.19x @ 10x) are sublinear but close to linear — one more decade
shows whether the char-shingle explode compounds. Generates a
DOCUMENTS-ONLY fixture at 100x sf0.1 rows (500k docs, same empirical
distributions and injected near-dup structure via
tools/gen_sf1.gen_documents) and times both queries at sf0.1 vs sf10.

Both queries read only the documents table, so the fixture directory
holds just documents.parquet. A JVM collection runs between timed legs
(same rationale as scale_check: a deferred full GC from the shingle
explosion must not land inside the next leg's wall clock).

Usage: python tools/sf10_docs_check.py [sf10_dir] [out_json]
(generates the fixture into sf10_dir if missing; default
/tmp/sf10_docs, BENCH_SCALE_SF10.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from genai_batch_processor_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
N_DOCS_SF10 = 500_000  # 100x sf0.1's 5k documents
QUERIES = ["simhash_near_dup", "ngram_jaccard"]


def ensure_fixture(sf10_dir: str) -> None:
    path = os.path.join(sf10_dir, "documents.parquet")
    if os.path.exists(path):
        return
    import numpy as np
    import pyarrow.parquet as pq

    from tools import gen_sf1

    os.makedirs(sf10_dir, exist_ok=True)
    t0 = time.monotonic()
    rng = np.random.default_rng(gen_sf1.SEED + 9)
    pq.write_table(gen_sf1.gen_documents(rng, N_DOCS_SF10), path)
    print(
        f"generated sf10 documents ({N_DOCS_SF10} rows) in "
        f"{time.monotonic() - t0:.1f}s",
        file=sys.stderr,
    )


def main() -> None:
    sf10_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_docs"
    out_json = (
        sys.argv[2] if len(sys.argv) > 2 else "BENCH_SCALE_SF10.json"
    )
    ensure_fixture(sf10_dir)
    spark = get_spark("sf10_docs_check")
    qs = entrymod.queries()
    results = {}
    for name in QUERIES:
        times = {}
        for label, d in (("sf0.1", SRC), ("sf10", sf10_dir)):
            spark._jvm.System.gc()
            t1 = time.monotonic()
            n = qs[name](spark, d).count()
            times[label] = round(time.monotonic() - t1, 3)
            times[f"rows_{label}"] = n
        times["ratio_100x"] = round(times["sf10"] / times["sf0.1"], 2)
        results[name] = times
        print(
            f"{name:20s} sf0.1={times['sf0.1']:7.2f}s "
            f"sf10={times['sf10']:8.2f}s ratio={times['ratio_100x']:6.1f} "
            f"rows {times['rows_sf0.1']}->{times['rows_sf10']}",
            file=sys.stderr,
        )
    payload = {
        "n_docs_sf01": 5_000,
        "n_docs_sf10": N_DOCS_SF10,
        "queries": results,
    }
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
