"""Sampling / split / curation operator tests: determinism, bounds, and
the plan shapes the 100 TB design claims (zero-shuffle rate sampling)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from genai_batch_processor_spark import queries
from genai_batch_processor_spark.operators import dedup, sampling
from genai_batch_processor_spark.sources.tables import load_table


def test_hash_sample_deterministic_and_nested(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id for r in sampling.hash_sample(docs, "doc_id", 0.3).collect()}
    b = {r.doc_id for r in sampling.hash_sample(docs, "doc_id", 0.3).collect()}
    assert a == b  # rerun reproduces the sample exactly
    wider = {
        r.doc_id for r in sampling.hash_sample(docs, "doc_id", 0.6).collect()
    }
    assert a <= wider  # raising the rate only ADDS rows (nested samples)
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n  # roughly the requested rate


def test_split_partition_is_total_and_disjoint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.withColumn("split", sampling.assign_split("doc_id"))
    counts = {r["split"]: r["n"] for r in
              labeled.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    assert counts["train"] > counts["val"] + counts["test"]  # ~80/10/10


def test_split_independent_of_sample(spark, sf_dir):
    """Salts decorrelate: the sampled subset must contain all three
    splits (a shared hash would align the two decisions)."""
    docs = load_table(spark, sf_dir, "documents")
    sampled = sampling.hash_sample(docs, "doc_id", 0.3)
    splits = {
        r["split"]
        for r in sampled.select(
            sampling.assign_split("doc_id").alias("split")
        ).distinct().collect()
    }
    assert splits == {"train", "val", "test"}


def test_quota_sample_bounds_every_stratum(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    capped = sampling.quota_sample(docs, "doc_id", "source", 7)
    per = capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 7 for r in per)
    # sources with >= 7 docs hit the cap exactly
    full = {r["source"]: r["n"] for r in
            docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    got = {r["source"]: r["n"] for r in per}
    for src, n in full.items():
        assert got.get(src, 0) == min(n, 7)


def test_rate_sampling_is_shuffle_free(spark, sf_dir):
    """The 100 TB claim: stratified rate sampling is a pure row-local
    filter — its plan must contain NO exchange at all."""
    df = queries.QUERIES["doc_sample"](spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "Scan parquet" in plan


def test_contamination_flags_near_dups_of_benchmark(spark):
    """Docs sharing 5-grams with the benchmark slice must be flagged;
    a synthetic clone of a benchmark doc must score the highest."""
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    bench = docs.filter(F.col("doc_id") < 20)
    clone = bench.filter(F.col("doc_id") == 0).select(
        F.lit(999_999).alias("doc_id"), "text"
    )
    corpus = docs.filter(F.col("doc_id") >= 20).select("doc_id", "text").unionAll(clone)
    hits = {r.doc_id: r.n_hits for r in
            dedup.contamination_hits(corpus, bench, "doc_id", "text").collect()}
    assert 999_999 in hits
    # the clone is FULLY contained: every one of its distinct 5-gram
    # shingles is a hit
    n_shingles = clone.select(
        F.size(F.array_distinct(dedup.shingle_hashes("text", 5))).alias("n")
    ).head()["n"]
    assert hits[999_999] == n_shingles


def test_contamination_benchmark_side_broadcasts(spark, sf_dir):
    df = queries.QUERIES["decontaminate"](spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# -- training-mixture operators ----------------------------------------------


def test_mixture_plan_rates_bind_and_cap(spark, sf_dir):
    from genai_batch_processor_spark import queries as q
    from genai_batch_processor_spark.functions import text as tx
    from genai_batch_processor_spark.operators import sampling
    from genai_batch_processor_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", tx.token_count("text")
    )
    plan = {
        r["source"]: r
        for r in sampling.mixture_plan(
            docs, "doc_id", "source", "n_tokens",
            q.MIX_WEIGHTS, q.MIX_TOKEN_BUDGET,
        ).collect()
    }
    # unconfigured sources: target 0 → rate 0
    for src, row in plan.items():
        if src not in q.MIX_WEIGHTS:
            assert row["rate_ppm"] == 0
        assert 0 <= row["rate_ppm"] <= 1_000_000
        expect = min(
            1_000_000,
            row["target_tokens"] * 1_000_000 // row["available_tokens"],
        )
        # floor(double division) == integer division for these magnitudes
        assert abs(row["rate_ppm"] - expect) <= 1
    # the fixture budget makes at least one rate bind and one cap
    configured = [plan[s]["rate_ppm"] for s in q.MIX_WEIGHTS if s in plan]
    assert any(r == 1_000_000 for r in configured)
    assert any(0 < r < 1_000_000 for r in configured)


def test_apply_mixture_respects_rates(spark, sf_dir):
    from genai_batch_processor_spark import queries as q
    from genai_batch_processor_spark.functions import text as tx
    from genai_batch_processor_spark.operators import sampling
    from genai_batch_processor_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", tx.token_count("text")
    )
    plan = sampling.mixture_plan(
        docs, "doc_id", "source", "n_tokens",
        q.MIX_WEIGHTS, q.MIX_TOKEN_BUDGET,
    )
    kept = sampling.apply_mixture(docs, plan, "doc_id", "source")
    per_src = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # only configured sources survive; full-rate sources keep everything
    assert set(per_src) <= set(q.MIX_WEIGHTS)
    full = {
        r["source"]
        for r in plan.filter(F.col("rate_ppm") == 1_000_000).collect()
    }
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src in full:
        assert per_src[src] == totals[src]


def test_curriculum_head_tracks_weights(spark, sf_dir):
    """Upweighted sources must be overrepresented at the head of the
    virtual-time order relative to their corpus share."""
    from genai_batch_processor_spark import queries as q

    head = {
        r["source"]: r["n_head"]
        for r in q.QUERIES["curriculum_mix"](spark, sf_dir).collect()
    }
    n_head = sum(head.values())
    # src0 (weight 4) should hold well over its uniform 1/20 share;
    # src3 (weight 0.25) well under it
    assert head.get("src0", 0) / n_head > 2 / 20
    assert head.get("src3", 0) / n_head < 1 / 20


def test_temperature_weights_flatten_toward_uniform(spark):
    """T=1 reproduces proportional shares; higher T compresses the
    head-tail gap; weights sum to ~1e6. (Synthetic skewed strata — the
    fixture's sources are near-uniform, where flattening is a no-op.)"""
    from genai_batch_processor_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, "head" if i < 900 else ("mid" if i < 990 else "tail"))
         for i in range(1000)],
        "doc_id long, source string",
    )

    def shares(t):
        rows = sampling.temperature_weights(
            docs, "source", temperature=t
        ).collect()
        return {r.source: (r.n_docs, r.weight_ppm) for r in rows}

    s1, s4 = shares(1.0), shares(4.0)
    assert set(s1) == set(s4)
    total1 = sum(w for _, w in s1.values())
    assert 1_000_000 - len(s1) <= total1 <= 1_000_000  # floor-div dust
    big = max(s1, key=lambda k: s1[k][0])
    small = min(s1, key=lambda k: s1[k][0])
    # T=1 ≈ proportional: ppm tracks doc share within rounding
    n_total = sum(n for n, _ in s1.values())
    assert abs(s1[big][1] - s1[big][0] * 1_000_000 // n_total) <= 1000
    # higher temperature narrows the big/small ratio
    ratio1 = s1[big][1] / max(s1[small][1], 1)
    ratio4 = s4[big][1] / max(s4[small][1], 1)
    assert ratio4 < ratio1


def test_weighted_sample(spark):
    """Weighted sampling's contracts: weight-1 rows always survive,
    weight-0 and NULL-weight rows never do, determinism across calls,
    and PER-ROW MONOTONICITY (raising every row's weight can only grow
    the kept set — the property that makes threshold sweeps stable)."""
    from pyspark.sql import functions as F

    from genai_batch_processor_spark.operators import sampling

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") % 10) / 10.0).alias("w"),  # weights 0.0 .. 0.9
    )
    kept = sampling.weighted_sample(df, "doc_id", F.col("w"))
    ids = {r.doc_id for r in kept.collect()}
    assert ids == {
        r.doc_id for r in sampling.weighted_sample(
            df, "doc_id", F.col("w")
        ).collect()
    }  # deterministic
    assert not {i for i in ids if i % 10 == 0}  # w=0 never kept
    ones = sampling.weighted_sample(
        df, "doc_id", F.lit(1.0)
    ).count()
    assert ones == 2000  # w=1 always kept
    assert sampling.weighted_sample(
        df, "doc_id", F.lit(None).cast("double")
    ).count() == 0  # NULL weight drops, like the SQL twin
    bumped = {
        r.doc_id
        for r in sampling.weighted_sample(
            df, "doc_id", F.least(F.col("w") + 0.3, F.lit(1.0))
        ).collect()
    }
    assert ids <= bumped  # per-row monotone
    # keep rate tracks the weight (law of large numbers, wide margin)
    frac = len(ids) / 2000
    assert 0.35 < frac < 0.55  # E[w] = 0.45
