"""sf10 tail evidence (round-7 item 8, extended round 9).

Two sections, one shared 100x fixture (documents AND embeddings at
100x sf0.1 rows — 500k docs / 200k vectors, same empirical
distributions and injected near-dup structure via tools/gen_sf1):

1. Worst-scaler queries: `simhash_near_dup` (r8: 94.7x @ 100x with
   896x output pairs — 32-bit ball saturation, now fixed by the
   adaptive 56-bit signature) and `ngram_jaccard` (33.7x @ 100x).
2. Incremental-probe family (r8 verdict item 3, probe batch fixed in
   r10 per the r9 verdict item 2): build the MinHash / trained-cell
   embedding index at each scale, probe a fixed-SIZE batch (500 docs
   of calibrated near-dups perturbed from THAT scale's corpus /
   200 vectors from sf0.1, re-keyed), and time ONLY the probe. The
   100 TB design claim is that probe cost is batch-proportional; the
   term that can still grow with the corpus is the single index scan
   the probe broadcasts into — this measures it rather than assuming
   it. Both legs hard-fail if the pair count at either scale is
   trivial, so the flatness evidence always carries pair-generation
   cost.

A JVM collection runs between timed legs (same rationale as
scale_check: a deferred full GC from the shingle explosion must not
land inside the next leg's wall clock).

Usage: python tools/sf10_docs_check.py [sf10_dir] [out_json]
(generates fixtures into sf10_dir if missing; default /tmp/sf10_docs,
BENCH_SCALE_SF10.json)
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
N_VECS_SF10 = 200_000  # 100x sf0.1's 2k embeddings
QUERIES = ["simhash_near_dup", "ngram_jaccard"]
PROBE_ID_OFFSET = 10_000_000  # disjoint id space for the fixed batch


def ensure_fixture(sf10_dir: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tools import gen_sf1

    os.makedirs(sf10_dir, exist_ok=True)
    docs_path = os.path.join(sf10_dir, "documents.parquet")
    if not os.path.exists(docs_path):
        t0 = time.monotonic()
        rng = np.random.default_rng(gen_sf1.SEED + 9)
        pq.write_table(gen_sf1.gen_documents(rng, N_DOCS_SF10), docs_path)
        print(
            f"generated sf10 documents ({N_DOCS_SF10} rows) in "
            f"{time.monotonic() - t0:.1f}s",
            file=sys.stderr,
        )
    emb_path = os.path.join(sf10_dir, "embeddings.parquet")
    if not os.path.exists(emb_path):
        t0 = time.monotonic()
        rng = np.random.default_rng(gen_sf1.SEED + 19)
        E = rng.standard_normal((N_VECS_SF10, 64)).astype(np.float32)
        E /= np.linalg.norm(E, axis=1, keepdims=True)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(N_VECS_SF10), type=pa.int64()),
                    "embedding": pa.array(
                        list(E), type=pa.list_(pa.float32())
                    ),
                    "label": pa.array(
                        rng.integers(0, 10, size=N_VECS_SF10),
                        type=pa.int32(),
                    ),
                }
            ),
            emb_path,
        )
        print(
            f"generated sf10 embeddings ({N_VECS_SF10} rows) in "
            f"{time.monotonic() - t0:.1f}s",
            file=sys.stderr,
        )


def _gc(spark) -> None:
    spark._jvm.System.gc()


def _leg_calib(spark) -> float:
    """GC + the shared bench calibration workload (r10 verdict item
    7): every timed leg stores its own calib next to its ratio so a
    loaded box can't fake a scaling cliff (this bit round 7)."""
    _gc(spark)
    import bench

    return bench.calibration_workload(spark)


def query_section(spark, sf10_dir: str) -> dict:
    qs = entrymod.queries()
    results = {}
    for name in QUERIES:
        times = {}
        for label, d in (("sf0.1", SRC), ("sf10", sf10_dir)):
            times[f"calib_{label}"] = _leg_calib(spark)
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
    return results


N_PROBE_BATCH = 500
PROBE_PAIR_FLOOR = 100  # loud non-triviality floor per scale


def perturbed_probe_batch(
    spark, corpus_dir: str, n_batch: int = N_PROBE_BATCH, seed: int = 77
):
    """Probe batch as calibrated near-dups of CORPUS docs (round-9
    verdict item 2). The previous fixed sf0.1 batch shared almost no
    near-dups with the independently generated sf10 corpus (3 pairs at
    sf10 vs 561 at sf0.1), so the flat-probe claim was measured nearly
    output-free on that leg. Here gen_sf1's similarity-preserving
    perturbation (3% word mutation keeps shingle Jaccard above the LSH
    threshold) is applied to a deterministic ``n_batch``-doc sample of
    the corpus at THIS scale, re-keyed into a disjoint id space. The
    batch stays fixed-SIZE across scales — the controlled variable of
    the batch-proportional claim — while guaranteeing the probe
    carries pair-generation cost at every scale."""
    import numpy as np
    from pyspark.sql import functions as F

    from pyspark.sql import Window

    docs = spark.read.parquet(
        os.path.join(corpus_dir, "documents.parquet")
    )
    n_corpus = docs.count()
    stride = max(1, n_corpus // n_batch)
    # Deterministic row_number over ordered doc_id, NOT modulo over raw
    # ids (r10 ADVICE): with sparse or offset ids the id-stride filter
    # silently under-fills the batch while results still report
    # batch_docs = N_PROBE_BATCH — the fixed-size controlled variable
    # of the flat-probe claim would shrink per scale. The 1-partition
    # window is bounded: this is a diagnostic tool ranking doc_id only.
    sample = (
        docs.select("doc_id", "text")
        .withColumn(
            "_rn",
            F.row_number().over(Window.orderBy("doc_id")) - 1,
        )
        .filter((F.col("_rn") % stride == 0) & (F.col("_rn") < stride * n_batch))
        .drop("_rn")
        .collect()  # bounded: exactly n_batch rows (asserted below)
    )
    if len(sample) != n_batch:
        raise SystemExit(
            f"probe batch under-filled: {len(sample)} of {n_batch} docs "
            f"(corpus={n_corpus}, stride={stride}) — the flat-probe "
            "claim's controlled variable must not shrink silently"
        )
    rng = np.random.default_rng(seed)
    vocab = sorted({w for r in sample for w in r["text"].split(" ")})
    rows = []
    for i, r in enumerate(sorted(sample, key=lambda r: r["doc_id"])):
        words = r["text"].split(" ")
        muts = rng.random(len(words)) < 0.03
        repl = rng.integers(0, len(vocab), size=int(muts.sum()))
        k = 0
        for j, m in enumerate(muts):
            if m:
                words[j] = vocab[repl[k]]
                k += 1
        rows.append((PROBE_ID_OFFSET + i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def probe_section(spark, sf10_dir: str) -> dict:
    """Fixed-size batch vs growing index: probe time should be ~flat
    (index-scan bounded); build time is reported alongside so the two
    costs never get conflated. Both legs must find a non-trivial pair
    count at BOTH scales (PROBE_PAIR_FLOOR) — a near-output-free probe
    would measure only the scan and overstate flatness."""
    from genai_batch_processor_spark.operators import (
        clustering,
        dedup,
        similarity,
    )
    from pyspark.sql import functions as F

    results: dict = {}

    # -- MinHash: 500 calibrated near-dups of each scale's corpus ----
    mh: dict = {"batch_docs": N_PROBE_BATCH}
    for label, d in (("sf0.1", SRC), ("sf10", sf10_dir)):
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        batch_docs = perturbed_probe_batch(spark, d).persist()
        batch_index = dedup.minhash_index(
            batch_docs, "doc_id", "text"
        ).persist()
        batch_index.count()  # materialize OUTSIDE the timed probe
        mh[f"calib_{label}"] = _leg_calib(spark)
        t0 = time.monotonic()
        index = dedup.minhash_index(docs, "doc_id", "text").persist()
        index.count()
        mh[f"build_{label}"] = round(time.monotonic() - t0, 3)
        _gc(spark)
        t0 = time.monotonic()
        n = dedup.incremental_near_dup_pairs(
            index, batch_docs, "doc_id", "text", batch_index=batch_index
        ).count()
        mh[f"probe_{label}"] = round(time.monotonic() - t0, 3)
        mh[f"pairs_{label}"] = n
        index.unpersist()
        batch_index.unpersist()
        batch_docs.unpersist()
        if n < PROBE_PAIR_FLOOR:
            raise SystemExit(
                f"minhash probe at {label} found only {n} pairs "
                f"(floor {PROBE_PAIR_FLOOR}) — the leg is near-output-"
                "free and the flat-probe evidence would be hollow; "
                "check the perturbation calibration / fixture drift"
            )
    mh["probe_ratio_100x"] = round(mh["probe_sf10"] / mh["probe_sf0.1"], 2)
    results["incremental_near_dup"] = mh
    print(
        f"incremental_near_dup probe sf0.1={mh['probe_sf0.1']:.2f}s "
        f"sf10={mh['probe_sf10']:.2f}s ratio={mh['probe_ratio_100x']:.2f} "
        f"(builds {mh['build_sf0.1']:.1f}s/{mh['build_sf10']:.1f}s)",
        file=sys.stderr,
    )

    # -- Embedding: 200-vector batch (sf0.1's vec_id % 10 == 3) -------
    batch_vecs = (
        spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
        .filter(F.col("vec_id") % 10 == 3)
        .select(
            (F.col("vec_id") + PROBE_ID_OFFSET).alias("vec_id"),
            "embedding",
        )
        .persist()
    )
    ev: dict = {"batch_vecs": batch_vecs.count()}
    for label, d in (("sf0.1", SRC), ("sf10", sf10_dir)):
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        ev[f"calib_{label}"] = _leg_calib(spark)
        t0 = time.monotonic()
        k = clustering.adaptive_k(emb.count())
        cents = clustering.centroids_from_cells(
            clustering.kmeans_cells(emb, k=k)
        )
        ev[f"train_{label}"] = round(time.monotonic() - t0, 3)
        ev[f"k_{label}"] = k
        t0 = time.monotonic()
        index = similarity.embedding_cell_index(emb, cents).persist()
        index.count()
        ev[f"build_{label}"] = round(time.monotonic() - t0, 3)
        _gc(spark)
        t0 = time.monotonic()
        n = similarity.incremental_embedding_pairs(
            index, batch_vecs, cents, max_cell=512
        ).count()
        ev[f"probe_{label}"] = round(time.monotonic() - t0, 3)
        ev[f"pairs_{label}"] = n
        index.unpersist()
        if n < PROBE_PAIR_FLOOR:
            raise SystemExit(
                f"embedding probe at {label} found only {n} pairs "
                f"(floor {PROBE_PAIR_FLOOR}) — near-output-free leg; "
                "check fixture drift"
            )
    batch_vecs.unpersist()
    ev["probe_ratio_100x"] = round(ev["probe_sf10"] / ev["probe_sf0.1"], 2)
    results["incremental_embedding_near_dup"] = ev
    print(
        f"incremental_embedding probe sf0.1={ev['probe_sf0.1']:.2f}s "
        f"sf10={ev['probe_sf10']:.2f}s ratio={ev['probe_ratio_100x']:.2f} "
        f"(train {ev['train_sf0.1']:.1f}s/{ev['train_sf10']:.1f}s, "
        f"builds {ev['build_sf0.1']:.1f}s/{ev['build_sf10']:.1f}s)",
        file=sys.stderr,
    )
    return results


def main() -> None:
    from tools._args import positional

    args = positional(usage="usage: sf10_docs_check.py [sf10_dir] [out_json]")
    sf10_dir = args[0] if args else "/tmp/sf10_docs"
    out_json = args[1] if len(args) > 1 else "BENCH_SCALE_SF10.json"
    ensure_fixture(sf10_dir)
    spark = get_spark("sf10_docs_check")
    _leg_calib(spark)  # untimed JIT warm-up for the calib workload
    results = query_section(spark, sf10_dir)
    payload = {
        "n_docs_sf01": 5_000,
        "n_docs_sf10": N_DOCS_SF10,
        "n_vecs_sf10": N_VECS_SF10,
        "queries": results,
        "probes": probe_section(spark, sf10_dir),
    }
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
