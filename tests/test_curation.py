"""Semantic invariants for the round-4 curation primitives — properties
the DuckDB oracle parity can't state (it would just repeat the same SQL):
funnel monotonicity, span-count arithmetic, DSIR feature accounting, RRF
consensus bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from genai_batch_processor_spark import queries as q
from genai_batch_processor_spark.functions import text as tx
from genai_batch_processor_spark.operators import similarity
from genai_batch_processor_spark.sources.tables import load_table


def test_funnel_monotone_and_total(spark, sf_dir):
    rows = {
        r.stage: r
        for r in q.q_quality_filter_funnel(spark, sf_dir).collect()
    }
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert rows[0].rule == "all" and rows[0].n_pass == n_docs
    assert list(rows) == sorted(rows)
    passes = [rows[i].n_pass for i in sorted(rows)]
    # each added rule can only remove documents
    assert all(a >= b for a, b in zip(passes, passes[1:]))
    assert [rows[i].rule for i in sorted(rows)] == list(q.FUNNEL_RULES)


def test_span_dedup_counts_and_self_duplication(spark, sf_dir):
    out = q.q_span_dedup_stats(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    # per-doc span count is max(n_words - SPAN_N + 1, 1) — shingles()
    # falls back to the whole text below SPAN_N words
    expected = docs.select(
        "doc_id",
        F.greatest(
            tx.word_count(F.lower("text")) - (q.SPAN_N - 1), F.lit(1)
        )
        .cast("long")
        .alias("want"),
    )
    joined = out.join(expected, "doc_id").collect()
    assert len(joined) == docs.count()
    for r in joined:
        assert r.n_spans == r.want
        assert 0 <= r.n_dup_spans <= r.n_spans
    # exact-duplicate text pairs must have every span duplicated
    dup_docs = (
        docs.groupBy(F.lower("text").alias("t"))
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode("ids").alias("doc_id"))
    )
    fully = out.join(dup_docs, "doc_id").collect()
    for r in fully:
        assert r.dup_ppm == 1_000_000, r


def test_dsir_feature_accounting(spark, sf_dir):
    out = q.q_dsir_weights(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    # bigram shingles: n_words - 1 features (>= 2 words), else 1
    expected = docs.select(
        "doc_id",
        F.greatest(tx.word_count(F.lower("text")) - 1, F.lit(1))
        .cast("long")
        .alias("want"),
    )
    joined = out.join(expected, "doc_id").collect()
    assert len(joined) == docs.count()
    for r in joined:
        assert r.n_feats == r.want


def test_span_dup_stats_containment(spark):
    """A document fully contained in another has every span duplicated
    (dup_ppm == 1e6) while the container is only partially duplicated —
    the containment signal whole-doc near-dup misses."""
    from genai_batch_processor_spark.operators import curation

    inner = "one two three four five six seven"
    outer = inner + " plus extra trailing words here beyond the copy"
    docs = spark.createDataFrame(
        [(1, outer), (2, inner), (3, "totally different text with no overlap at all")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in curation.span_dup_stats(docs).collect()}
    assert out[2].dup_ppm == 1_000_000  # contained doc: all spans shared
    assert 0 < out[1].dup_ppm < 1_000_000  # container: partial
    assert out[3].dup_ppm == 0  # unrelated doc: none


def test_span_index_probe_containment(spark):
    """Probing a corpus substring reports full containment; probing
    novel text reports zero; a mix lands in between."""
    from genai_batch_processor_spark.operators import curation

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    idx = curation.span_index(corpus)
    probes = spark.createDataFrame(
        [
            (10, "beta gamma delta epsilon zeta eta"),  # substring
            (11, "nova terra luna stella cosmo orbis"),  # novel
            (12, "gamma delta epsilon zeta eta nova"),  # mixed tail
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r for r in curation.probe_span_index(idx, probes).collect()
    }
    assert out[10].known_ppm == 1_000_000
    assert out[11].known_ppm == 0
    assert 0 < out[12].known_ppm < 1_000_000


def test_filter_funnel_no_rules(spark):
    from genai_batch_processor_spark.operators import curation

    df = spark.range(7)
    rows = curation.filter_funnel(df, []).collect()
    assert len(rows) == 1
    assert (rows[0].stage, rows[0].rule, rows[0].n_pass) == (0, "all", 7)


def test_dsir_weights_keeps_null_and_empty_text(spark):
    from genai_batch_processor_spark.operators import curation

    docs = spark.createDataFrame(
        [(1, "the quick brown fox", "en"), (2, None, "de"), (3, "", "en")],
        "doc_id long, text string, lang string",
    )
    out = curation.dsir_weights(docs, F.col("lang") == "en").collect()
    # every input id present — NULL/empty text must not silently vanish
    assert sorted(r.doc_id for r in out) == [1, 2, 3]
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n_feats == 3  # 4 words -> 3 bigrams
    assert by_id[2].n_feats == 1  # coalesced '' -> one feature
    assert by_id[3].n_feats == 1


def test_rrf_fuse_matches_python_reference(spark):
    """rrf_fuse vs a pure-Python RRF on randomized ranking lists —
    checks the operator itself, independent of the fixture corpus."""
    import random

    from genai_batch_processor_spark.operators import curation

    rng = random.Random(20260814)
    for trial in range(4):
        n_sys = rng.randint(1, 3)
        systems = []
        for _ in range(n_sys):
            rows = []
            for qid in range(rng.randint(1, 4)):
                neighbors = rng.sample(range(100), rng.randint(0, 6))
                rows.extend(
                    (qid, n, r + 1) for r, n in enumerate(neighbors)
                )
            systems.append(rows)
        if not any(systems):
            continue
        expected: dict[tuple[int, int], int] = {}
        for rows in systems:
            for qid, n, rank in rows:
                expected[(qid, n)] = expected.get((qid, n), 0) + (
                    1_000_000 // (60 + rank)
                )
        dfs = [
            spark.createDataFrame(
                rows or [(0, 0, 1)],
                "query_id long, neighbor_id long, rank int",
            ).limit(len(rows))
            for rows in systems
        ]
        got = {
            (r.query_id, r.neighbor_id): r.rrf_micro
            for r in curation.rrf_fuse(dfs).collect()
        }
        assert got == expected, f"trial {trial}"


def test_filter_funnel_matches_python_reference(spark):
    import random

    from pyspark.sql import functions as SF

    from genai_batch_processor_spark.operators import curation

    rng = random.Random(20260815)
    for trial in range(4):
        vals = [
            (rng.randint(0, 9), rng.randint(0, 9)) for _ in range(30)
        ]
        df = spark.createDataFrame(vals, "a int, b int")
        rules = [
            ("a_small", SF.col("a") <= 5),
            ("b_even", SF.col("b") % 2 == 0),
            ("sum_bound", SF.col("a") + SF.col("b") < 12),
        ]
        py_rules = [
            lambda r: r[0] <= 5,
            lambda r: r[1] % 2 == 0,
            lambda r: r[0] + r[1] < 12,
        ]
        expected = [len(vals)]
        for k in range(1, len(py_rules) + 1):
            expected.append(
                sum(1 for v in vals if all(p(v) for p in py_rules[:k]))
            )
        out = {
            r.stage: (r.rule, r.n_pass)
            for r in curation.filter_funnel(df, rules).collect()
        }
        assert [out[i][1] for i in range(len(expected))] == expected
        assert out[0][0] == "all" and out[2][0] == "b_even"


def test_rrf_fusion_consensus_bounds(spark, sf_dir):
    rows = q.q_rrf_fusion(spark, sf_dir).collect()
    k = similarity.TOPK_DEFAULT
    per_query: dict[int, list] = {}
    for r in rows:
        assert r.n_lists in (1, 2)
        # contribution bounds: rank 1..k in each list
        lo = r.n_lists * (1_000_000 // (q.RRF_K + k))
        hi = r.n_lists * (1_000_000 // (q.RRF_K + 1))
        assert lo <= r.rrf_micro <= hi, r
        per_query.setdefault(r.query_id, []).append(r)
    for qid, rs in per_query.items():
        ranks = sorted(x.fused_rank for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= k
        # fused order must follow rrf_micro descending
        by_rank = sorted(rs, key=lambda x: x.fused_rank)
        scores = [x.rrf_micro for x in by_rank]
        assert scores == sorted(scores, reverse=True)


def test_filter_funnel_rule_names_with_sql_metacharacters(spark):
    """Rule names are caller data, not SQL: quotes/backslashes in a
    name must pass through verbatim (the r4 stack()-interpolation
    shape broke on an apostrophe)."""
    from genai_batch_processor_spark.operators import curation

    df = spark.range(5)
    rules = [
        ("doesn't crash", F.col("id") >= 1),
        ('has "quotes" \\ backslash', F.col("id") >= 3),
    ]
    rows = {r.stage: r for r in curation.filter_funnel(df, rules).collect()}
    assert rows[0].n_pass == 5 and rows[0].rule == "all"
    assert rows[1].n_pass == 4 and rows[1].rule == "doesn't crash"
    assert rows[2].n_pass == 2
    assert rows[2].rule == 'has "quotes" \\ backslash'


def test_probe_span_index_shuffle_fallback_equals_broadcast(spark):
    """broadcast_batch=False (the oversized-ingest escape hatch) must
    produce the identical relation via a shuffle join, and the
    broadcast path's plan must actually broadcast the batch side."""
    from genai_batch_processor_spark.operators import curation

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = curation.span_index(docs)
    probes = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 500_000).alias("doc_id"), "text"
    )
    bcast = curation.probe_span_index(idx, probes)
    shuffled = curation.probe_span_index(
        idx, probes, broadcast_batch=False
    )
    a = {tuple(r) for r in bcast.collect()}
    b = {tuple(r) for r in shuffled.collect()}
    assert a == b and len(a) > 0
    plan = bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
