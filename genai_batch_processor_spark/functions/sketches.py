"""Deterministic cardinality sketches (KMV / k-minimum-values).

``approx_count_distinct`` (HLL++) is the built-in scale path, but its
binary sketch is engine-specific — it cannot be oracle-checked and two
engines disagree on the estimate. KMV over the portable md5 hash is the
deterministic alternative: keep the k smallest hash values of a set;
the k-th smallest m (as a fraction of the hash space) estimates the
cardinality as (k-1)/m. Same hashes → same sketch → same estimate on
ANY engine, which makes the sketch itself testable (SURVEY.md §5) and
mergeable across partitions/engines by a simple min-k union.

Scale shape: the implementation below distincts the hash relation and
rank-filters the k smallest per group — one shuffle on the group key,
bounded output (k rows/group). At true 100 TB scale the upgrade is a
bounded-state UDAF (k-element heap per partition, min-k merge), same
math, no per-group sort; the SQL-visible contract here is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from genai_batch_processor_spark.functions import hashing

KMV_K = 16  # fixture-sized so the estimator path actually runs (vocab ≈ 31)
HASH_SPACE = float(1 << 60)  # portable_hash60 range


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-group distinct-count estimate: (group, est_distinct).

    Groups with fewer than k distinct values report the EXACT count
    (their full hash set fits in the sketch); larger groups use the
    (k-1)/m estimator with ~1/sqrt(k) relative error."""
    # NULL values are not values: unfiltered, the NULL hash occupies a
    # rank-1 slot in Spark (nulls sort FIRST) but ranks LAST in DuckDB,
    # skewing the k-th minimum differently on each engine (fuzz-pinned)
    hashed = (
        df.select(
            F.col(group_col).alias("__g"),
            hashing.portable_hash60(value_col).alias("__h"),
        )
        .filter(F.col("__h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("__g").orderBy("__h")
    topk = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
    )
    per = topk.groupBy("__g").agg(
        F.max("__h").alias("__kth"), F.count(F.lit(1)).alias("__nk")
    )
    est = (
        F.when(F.col("__nk") < k, F.col("__nk").cast("double"))
        .otherwise(
            F.round(
                F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("__kth"), 2
            )
        )
    )
    return per.select(
        F.col("__g").alias(group_col), est.alias("est_distinct")
    )


def sql_kmv_distinct(
    relation_sql: str, group_col: str, value_expr: str, k: int = KMV_K
) -> str:
    """DuckDB twin: same hashes, same rank-filter, same estimator."""
    h = hashing.sql_hash60(value_expr)
    return f"""
    WITH __hashed AS (
      SELECT DISTINCT {group_col} AS g, {h} AS h FROM ({relation_sql})
      WHERE {h} IS NOT NULL
    ), __ranked AS (
      SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
      FROM __hashed
    ), __per AS (
      SELECT g, max(h) AS kth, count(*) AS nk
      FROM __ranked WHERE rn <= {k} GROUP BY g
    )
    SELECT g AS {group_col},
           CASE WHEN nk < {k} THEN CAST(nk AS DOUBLE)
                ELSE round({float(k - 1)} * {HASH_SPACE} / kth, 2)
           END AS est_distinct
    FROM __per
    """


# -- Misra-Gries heavy hitters -------------------------------------------------
#
# "Which tokens exceed phi = 1/(MG_K+1) of the corpus?" The naive answer
# group-bys the FULL vocabulary — at 100 TB that shuffle is sized by the
# long tail (billions of keys), to answer a question about a handful.
# Misra-Gries bounds the state instead: each partition keeps MG_K
# counters; any item whose partition count exceeds n_p/(MG_K+1)
# survives its partition summary, and by pigeonhole any GLOBAL item
# above n/(MG_K+1) must exceed the local rate in at least one
# partition — so the UNION of partition summaries is a guaranteed
# superset of the true heavy hitters. A second exact pass counts ONLY
# those candidates (a broadcast semi-join, shuffling <= MG_K x
# n_partitions keys instead of the vocabulary) and applies the exact
# threshold. The final answer is therefore exact and independent of
# partitioning — which is what makes it oracle-checkable: the DuckDB
# twin is the plain GROUP BY ... HAVING.

MG_K = 49  # counters per partition; guarantees phi = 1/50 capture


def _mg_compress(counts: dict, k: int) -> None:
    """In place: keep <= k entries by subtracting the (k+1)-th largest
    count from all (the batched form of MG's decrement-all step)."""
    if len(counts) <= k:
        return
    cut = sorted(counts.values(), reverse=True)[k]
    for key in [key for key, c in counts.items() if c - cut <= 0]:
        del counts[key]
    for key in counts:
        counts[key] -= cut


def mg_candidates(tokens: DataFrame, token_col: str, k: int) -> DataFrame:
    """Pass 1: the union of per-partition Misra-Gries summaries — a
    guaranteed superset of every token with count * (k+1) > total.
    Arrow-batched mapInPandas with ONE MG state per partition carried
    across the batch iterator; <= k candidate rows emitted per
    partition."""
    import pandas as pd

    def _mg_partition(batches):
        state: dict = {}
        for pdf in batches:
            # Batch-level count in C (value_counts) then one merge per
            # DISTINCT token — identical state math to a per-token
            # loop (the compress step already ran once per batch), at
            # vectorized speed (optimization guide §4.2).
            for tok, n in pdf[token_col].value_counts(dropna=True).items():
                state[tok] = state.get(tok, 0) + int(n)
            _mg_compress(state, k)
        yield pd.DataFrame({token_col: list(state.keys())})

    return tokens.mapInPandas(
        _mg_partition, schema=f"{token_col} string"
    ).distinct()


def heavy_hitters(
    tokens: DataFrame, token_col: str, k: int = MG_K
) -> DataFrame:
    """Exact tokens with count * (k+1) > total, via an MG candidate pass.

    ``tokens`` is one row per token occurrence. Pass 1
    (:func:`mg_candidates`) bounds per-partition state at k counters;
    pass 2 re-counts candidates exactly (semi-join against the
    broadcast candidate relation) and thresholds against the exact
    total. At fixture scale the 31-word vocabulary fits the k=49
    counters so summaries never compress; the compression path is
    pinned by tests on a skewed synthetic corpus
    (tests/test_properties.py).

    Cost shape: three scans of the token relation — the Python MG pass
    (dominant), the exact-total count, and the recount — deliberately
    NOT collapsed: emitting per-partition totals from the MG pass and
    reusing its output twice in one plan would recompute the Python
    scan (Spark has no cross-branch plan CSE without caching), and
    persisting it would leak a cache per invocation. The two extra
    scans are vectorized single-column counts, ~free next to the
    Arrow-batched sketch pass."""
    candidates = mg_candidates(tokens, token_col, k)
    total = tokens.select(
        F.count(token_col).alias("__n")
    )  # exact denominator, one scalar
    return (
        tokens.join(F.broadcast(candidates), token_col, "left_semi")
        .groupBy(token_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * (k + 1) > F.col("__n"))
        .select(token_col, F.col("cnt").cast("long").alias("cnt"))
    )


def sql_heavy_hitters(relation_sql: str, token_col: str, k: int = MG_K) -> str:
    """DuckDB twin: the exact GROUP BY ... HAVING the sketch answers."""
    return f"""
    WITH __toks AS ({relation_sql}),
         __tot AS (SELECT count({token_col}) AS n FROM __toks)
    SELECT {token_col}, CAST(count(*) AS BIGINT) AS cnt
    FROM __toks, __tot
    GROUP BY {token_col}, __tot.n
    HAVING count(*) * {k + 1} > __tot.n
    """


def grouped_mg_candidates(
    tokens: DataFrame, group_col: str, token_col: str, k: int
) -> DataFrame:
    """Per-group pass 1: one MG state PER GROUP per partition (memory
    k x groups-per-partition). The pigeonhole guarantee localizes per
    group: any token above n_g/(k+1) of ITS group's total must exceed
    the local rate in at least one partition's slice of that group, so
    the union of per-(partition, group) summaries is a guaranteed
    superset of every group's heavy hitters."""
    import pandas as pd

    def _part(batches):
        states: dict = {}
        for pdf in batches:
            # Vectorized twin of the flat pass: one C-speed
            # (group, token) count per batch, merged per distinct
            # pair — same state math as the per-row loop (guide §4.2).
            vc = (
                pdf[[group_col, token_col]]
                .dropna()
                .value_counts()
            )
            for (g, t), n in vc.items():
                st = states.setdefault(g, {})
                st[t] = st.get(t, 0) + int(n)
            for st in states.values():
                _mg_compress(st, k)
        yield pd.DataFrame(
            {
                group_col: [g for g, st in states.items() for _ in st],
                token_col: [t for st in states.values() for t in st],
            }
        )

    return tokens.mapInPandas(
        _part, schema=f"{group_col} string, {token_col} string"
    ).distinct()


def grouped_heavy_hitters(
    tokens: DataFrame, group_col: str, token_col: str, k: int = MG_K
) -> DataFrame:
    """Per-group exact heavy hitters: tokens with count * (k+1) > the
    GROUP's total. Same two-pass shape as :func:`heavy_hitters` — the
    candidate relation and the per-group totals (|groups| rows) both
    broadcast, so the only shuffle keyed on the vocabulary is over the
    candidate subset. Exact final threshold per group ⇒ the result is
    partitioning-independent and the oracle is the plain
    GROUP BY group, token ... HAVING against the per-group counts."""
    candidates = grouped_mg_candidates(tokens, group_col, token_col, k)
    totals = tokens.groupBy(group_col).agg(
        F.count(token_col).alias("__n")
    )
    return (
        tokens.join(
            F.broadcast(candidates), [group_col, token_col], "left_semi"
        )
        .groupBy(group_col, token_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(totals), group_col)
        .filter(F.col("cnt") * (k + 1) > F.col("__n"))
        .select(
            group_col, token_col, F.col("cnt").cast("long").alias("cnt")
        )
    )


def sql_grouped_heavy_hitters(
    relation_sql: str, group_col: str, token_col: str, k: int = MG_K
) -> str:
    """DuckDB twin: per-group GROUP BY ... HAVING the sketch answers."""
    return f"""
    WITH __toks AS ({relation_sql}),
         __tot AS (
           SELECT {group_col} AS g, count({token_col}) AS n
           FROM __toks GROUP BY {group_col}
         )
    SELECT t.{group_col}, t.{token_col}, CAST(count(*) AS BIGINT) AS cnt
    FROM __toks t JOIN __tot ON __tot.g = t.{group_col}
    GROUP BY t.{group_col}, t.{token_col}, __tot.n
    HAVING count(*) * {k + 1} > __tot.n
    """
