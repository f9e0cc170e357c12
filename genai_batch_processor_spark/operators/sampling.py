"""Deterministic sampling & split operators for training-data curation.

A 100 TB corpus is never trained on whole: pipelines mix sources at
tuned rates (stratified sampling), carve held-out splits, and cap
per-source volume (quota sampling). The reference has no sampling
surface; these are mandated training-data-pipeline extensions
(SURVEY.md §2.D family), designed Spark-first:

- every sample is a PURE FUNCTION of the row key via the portable md5
  hash (functions/hashing.py) — no RNG state, no seed plumbing, no
  sampleBy approximation. Re-running the job reproduces the sample
  bit-for-bit on any engine (the DuckDB twins prove it), and adding
  executors cannot change membership — the property `df.sample()`
  cannot give you.
- rate/split sampling is a stateless per-row filter: no shuffle, scales
  embarrassingly, composes with partition pruning (the filter sits
  right above the scan).
- quota sampling is a per-stratum top-k: one shuffle on the stratum
  key; rank by hash so the retained set is an unbiased fixed-size
  subsample, not head-of-file bias. Strata counts are bounded by the
  quota, so skew is structurally capped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from genai_batch_processor_spark.functions import hashing

# hash-coordinate resolution: u = h32(key) mod 10^6 gives ~1e-6 rate
# granularity while keeping all arithmetic exact int64
COORD_MOD = 1_000_000

SPLIT_NAMES = ("train", "val", "test")
DEFAULT_SPLIT_PCTS = (80, 10, 10)


def hash_coord(key: Column | str, salt: str = "") -> Column:
    """Uniform sampling coordinate in [0, COORD_MOD) from the row key.
    ``salt`` decorrelates independent sampling decisions over the same
    key (sample vs split must not align)."""
    c = F.col(key) if isinstance(key, str) else key
    salted = F.concat(F.lit(salt), c.cast("string"))
    return hashing.portable_hash32(salted) % COORD_MOD


def sql_hash_coord(expr: str, salt: str = "") -> str:
    salted = f"('{salt}' || CAST({expr} AS VARCHAR))"
    return f"({hashing.sql_hash32(salted)} % {COORD_MOD})"


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic uniform sample: keep rows whose hash coordinate
    falls below ``fraction``. Stateless filter — zero shuffle."""
    return df.filter(hash_coord(key_col, salt) < int(fraction * COORD_MOD))


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic WEIGHTED subsample: keep each row with probability
    equal to its own ``weight`` in [0, 1] — the standard
    quality-weighted curation rule (a 0.9-quality doc survives 9x as
    often as a 0.1 one), e.g. ``weight = text.quality_score(...)``.
    Same contract as every sampler here: the keep decision is a pure
    row-local function of (key, weight) via the portable hash — no RNG
    state, bit-for-bit reproducible on any engine and any cluster
    size, zero shuffle, and PER-ROW MONOTONE (raising a row's weight
    can only keep a row it already kept — the property that makes
    threshold sweeps stable). NULL weight ⇒ row dropped (comparison
    with NULL is never true), matching the SQL twin."""
    w = F.round(weight * COORD_MOD, 0).cast("long")
    return df.filter(hash_coord(key_col, salt) < w)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum rates (source/language mixing weights): the rate is a
    CASE over the stratum, the keep decision still a pure row-local
    filter. Strata with no configured rate keep ``default_rate``."""
    threshold: Column = F.lit(int(default_rate * COORD_MOD))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * COORD_MOD))
        ).otherwise(threshold)
    return df.filter(hash_coord(key_col, salt) < threshold)


def sql_stratified_threshold(
    strata_expr: str, rates: dict[str, float], default_rate: float = 0.0
) -> str:
    out = str(int(default_rate * COORD_MOD))
    for stratum, rate in sorted(rates.items()):
        out = (
            f"(CASE WHEN {strata_expr} = '{stratum}' "
            f"THEN {int(rate * COORD_MOD)} ELSE {out} END)"
        )
    return out


def assign_split(
    key: Column | str,
    pcts: tuple[int, ...] = DEFAULT_SPLIT_PCTS,
    names: tuple[str, ...] = SPLIT_NAMES,
    salt: str = "split",
) -> Column:
    """train/val/test label as a pure function of the row key — the
    held-out set is stable across reruns, engines, and cluster sizes
    (percentages over the 0-99 hash bucket)."""
    assert sum(pcts) == 100 and len(pcts) == len(names)
    bucket = hash_coord(key, salt) % 100
    expr = F.lit(names[-1])
    edge = 0
    conds = []
    for name, pct in zip(names[:-1], pcts[:-1]):
        edge += pct
        conds.append((edge, name))
    for edge, name in reversed(conds):
        expr = F.when(bucket < edge, F.lit(name)).otherwise(expr)
    return expr


def sql_assign_split(
    expr: str,
    pcts: tuple[int, ...] = DEFAULT_SPLIT_PCTS,
    names: tuple[str, ...] = SPLIT_NAMES,
    salt: str = "split",
) -> str:
    bucket = f"({sql_hash_coord(expr, salt)} % 100)"
    out = f"'{names[-1]}'"
    edge = 0
    conds = []
    for name, pct in zip(names[:-1], pcts[:-1]):
        edge += pct
        conds.append((edge, name))
    for edge, name in reversed(conds):
        out = f"(CASE WHEN {bucket} < {edge} THEN '{name}' ELSE {out} END)"
    return out


def quota_sample(
    df: DataFrame, key_col: str, strata_col: str, quota: int, salt: str = "quota"
) -> DataFrame:
    """At most ``quota`` rows per stratum, chosen by hash rank (unbiased
    fixed-size subsample, not head-of-file bias). One shuffle on the
    stratum key; output per stratum is bounded by the quota so the
    downstream relation cannot be skewed."""
    w = Window.partitionBy(strata_col).orderBy(
        hash_coord(key_col, salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__qrank", F.row_number().over(w))
        .filter(F.col("__qrank") <= quota)
        .drop("__qrank")
    )


# -- training-mixture operators ----------------------------------------------

INV_WEIGHT_SCALE = 1_000_000


def curriculum_time(
    key: Column | str,
    strata: Column | str,
    weights: dict[str, float],
    salt: str = "curriculum",
) -> Column:
    """Weight-proportional virtual consumption time: vt = hash_coord ×
    round(SCALE / weight). A reader consuming rows in vt order sees
    strata interleaved proportionally to their weights (a stratum with
    2× the weight advances half as fast through the uniform hash line),
    with NO window and NO shuffle — vt is a pure row-local integer
    expression, so a 100 TB corpus computes it inside the scan and
    range-partitions by vt to materialize the order. Unknown strata get
    weight 1."""
    inv: Column = F.lit(INV_WEIGHT_SCALE)
    s = F.col(strata) if isinstance(strata, str) else strata
    for stratum, w in sorted(weights.items()):
        inv = F.when(
            s == stratum, F.lit(round(INV_WEIGHT_SCALE / w))
        ).otherwise(inv)
    return hash_coord(key, salt) * inv


def sql_curriculum_time(
    key_expr: str,
    strata_expr: str,
    weights: dict[str, float],
    salt: str = "curriculum",
) -> str:
    inv = str(INV_WEIGHT_SCALE)
    for stratum, w in sorted(weights.items()):
        inv = (
            f"(CASE WHEN {strata_expr} = '{stratum}' "
            f"THEN {round(INV_WEIGHT_SCALE / w)} ELSE {inv} END)"
        )
    return f"({sql_hash_coord(key_expr, salt)} * {inv})"


def mixture_plan(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    token_col: str,
    weights: dict[str, float],
    token_budget: int,
) -> DataFrame:
    """Per-stratum sampling plan to hit a global token budget at a
    target mixture: desired tokens per stratum = budget × weight;
    rate_ppm = min(1e6, floor(desired × 1e6 / available)). One tiny
    aggregate (|strata| rows) — the relation a planner broadcasts back
    onto the corpus to apply the mixture (see ``apply_mixture``). All
    integer arithmetic, so any engine derives the identical plan."""
    target: Column = F.lit(0).cast("long")
    for stratum, w in sorted(weights.items()):
        target = F.when(
            F.col(strata_col) == stratum,
            F.lit(int(token_budget * w)).cast("long"),
        ).otherwise(target)
    return (
        df.groupBy(strata_col)
        .agg(F.sum(token_col).cast("long").alias("available_tokens"))
        .withColumn("target_tokens", target)
        .withColumn(
            "rate_ppm",
            # decimal widening + integral `div`: target×1e6 overflows
            # int64 once a stratum's token target passes ~9.2e12 — real
            # at the 100 TB scale this plans for — and a wrapped-negative
            # rate would silently drop the largest strata. DuckDB twin
            # uses HUGEINT `//`; both are exact integer floors.
            F.least(
                F.lit(1_000_000).cast("long"),
                F.expr(
                    "CAST(target_tokens AS DECIMAL(38,0)) * 1000000 "
                    "div available_tokens"
                ).cast("long"),
            ),
        )
    )


# Power-scale for temperature weights: one shared constant so the
# DuckDB oracle interpolates the same value the operator uses.
TEMP_SCALE = 1000


def temperature_weights(
    df: DataFrame,
    strata_col: str,
    temperature: float = 2.0,
    scale: int = TEMP_SCALE,
) -> DataFrame:
    """Temperature-flattened mixture weights — the multilingual/
    multi-source LM standard (w_s ∝ n_s^(1/T)): T=1 is proportional
    sampling, T→∞ uniform; T≈2-5 up-weights small sources so the head
    doesn't drown the tail.

    Engine-exactness: the per-stratum power is rounded to a SCALED
    INTEGER before the normalizing sum, so the total is order-free and
    ``weight_ppm`` comes from integer division — no float accumulation
    crosses engines. One tiny aggregate (|strata| rows) + a broadcast
    1-row total; the result is the relation a 100 TB run broadcasts
    back onto the corpus exactly like ``mixture_plan``."""
    counts = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    powed = counts.withColumn(
        "w_scaled",
        F.round(
            F.pow(F.col("n_docs").cast("double"), 1.0 / temperature)
            * scale
        ).cast("long"),
    )
    total = F.broadcast(
        powed.agg(F.sum("w_scaled").cast("long").alias("w_total"))
    )
    return powed.crossJoin(total).select(
        strata_col,
        "n_docs",
        F.expr("w_scaled * 1000000 div w_total").alias("weight_ppm"),
    )


def apply_mixture(
    df: DataFrame,
    plan: DataFrame,
    key_col: str,
    strata_col: str,
    salt: str = "mixture",
) -> DataFrame:
    """Apply a mixture plan: broadcast the |strata|-row plan onto the
    corpus and keep rows whose hash coordinate clears the stratum's
    rate. The scan-side work stays a row-local filter; the only join is
    against a broadcast relation bounded by the stratum count."""
    rates = F.broadcast(plan.select(strata_col, "rate_ppm"))
    return df.join(rates, strata_col).filter(
        hash_coord(key_col, salt) < F.col("rate_ppm")
    )
