"""Vector math over ``array<float>`` embedding columns — pure column exprs.

Similarity search (north-star op, SURVEY.md §2.D) needs dot / norm /
cosine over the `embeddings.embedding` column. All JVM-side higher-order
functions (``zip_with`` + ``aggregate``) — no Python UDF in the hot path;
whole-stage codegen applies. Cast to double before accumulating so both
Spark and the DuckDB oracle (``list_dot_product`` on FLOAT[] promotes the
same way) agree to ~1e-15.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from genai_batch_processor_spark.functions.exprs import bind


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """NULL when either vector has zero norm (try_divide) — under ANSI
    mode a plain division would abort the job on the first zero vector;
    a NULL cosine drops the pair from any threshold/rank downstream."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def sign_bits_bucket(a: Column | str, n_bits: int = 8) -> Column:
    """Random-hyperplane-free LSH bucket: sign pattern of the first
    ``n_bits`` components, packed into an int. A deterministic coarse
    quantizer (IVF-style) both Spark and ANSI SQL can compute; vectors in
    the same bucket are near in angle with high probability, so exact
    cosine only runs within buckets (SURVEY.md §2.D scale path).

    Vectors shorter than ``n_bits`` bucket safely: try_element_at gives
    NULL out of bounds, and a NULL >= 0 condition falls to the 0 bit —
    plain element_at would abort the whole job under ANSI mode. DuckDB
    list indexing is NULL out of bounds, so the oracle already agrees."""
    arr = _c(a)
    bucket = F.lit(0)
    for i in range(n_bits):
        bit = F.when(
            F.try_element_at(arr, F.lit(i + 1)) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("long")


# DuckDB oracle fragments (same math, same order of accumulation)
def sql_dot(a: str, b: str) -> str:
    return f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"


def sql_cosine(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
        f"nullif(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
        f"sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])), 0))"
    )


def sql_sign_bits_bucket(a: str, n_bits: int = 8) -> str:
    terms = " + ".join(
        f"(CASE WHEN {a}[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_bits)
    )
    return f"(CAST({terms} AS BIGINT))"


def quantize_int8_stats(a: Column | str) -> Column:
    """Symmetric int8 quantization diagnostics for an embedding column:
    struct(scale, max_abs_err, n_saturated). scale = max|x| / 127;
    codes = round(x / scale) clamped to [-127, 127]; the error stats
    are order-free (max / count), so both engines agree bit-exactly
    without relying on a summation order. Zero vectors quantize to
    scale 0 and NULL error stats (the 0/0 code is NULL on both
    engines), so they surface rather than silently passing."""
    arr = _c(a)

    # scale is itself an O(dim) reduction; let-bind it (exprs.bind) so
    # the per-element lambdas read a materialized scalar — inline it and
    # the whole reduction re-runs once per element (O(dim²) per vector).
    def stats(scale: Column) -> Column:
        code = lambda x: F.greatest(  # noqa: E731
            F.lit(-127.0),
            F.least(
                F.lit(127.0),
                F.round(F.try_divide(x.cast("double"), scale), 0),
            ),
        )
        err = F.transform(
            arr, lambda x: F.abs(x.cast("double") - code(x) * scale)
        )
        n_sat = F.size(
            F.filter(arr, lambda x: F.abs(code(x)) >= F.lit(127.0))
        )
        return F.struct(
            scale.alias("scale"),
            F.array_max(err).alias("max_abs_err"),
            n_sat.cast("int").alias("n_saturated"),
        )

    absmax = F.array_max(F.transform(arr, lambda x: F.abs(x.cast("double"))))
    return bind(F.try_divide(absmax, F.lit(127.0)), stats)


def sql_quantize_int8_stats(a: str) -> str:
    """DuckDB twin of :func:`quantize_int8_stats` — emitted as three
    parallel expressions via a struct_pack for SELECT-side splitting."""
    absmax = f"list_max(list_transform({a}, x -> abs(CAST(x AS DOUBLE))))"
    scale = f"({absmax} / nullif(127.0, 0))"
    code = (
        f"greatest(-127.0, least(127.0, "
        f"round(CAST(x AS DOUBLE) / nullif({scale}, 0), 0)))"
    )
    err = (
        f"list_transform({a}, x -> abs(CAST(x AS DOUBLE) - {code} * {scale}))"
    )
    nsat = f"len(list_filter({a}, x -> abs({code}) >= 127.0))"
    return (
        f"struct_pack(scale := {scale}, "
        f"max_abs_err := list_max({err}), "
        f"n_saturated := CAST({nsat} AS INT))"
    )


def int8_scale(a: Column | str) -> Column:
    """Symmetric int8 scale: max|x| / 127 (0.0 for the zero vector)."""
    arr = _c(a)
    absmax = F.array_max(
        F.transform(arr, lambda x: F.abs(x.cast("double")))
    )
    return F.try_divide(absmax, F.lit(127.0))


def int8_codes(a: Column | str) -> Column:
    """Quantized codes as INTEGER-VALUED doubles (round(x/scale)
    clamped to ±127) — double-typed so :func:`dot` consumes them
    directly, and every value is an exact small integer, making the
    code dot product order-independent by construction. Zero vectors
    yield NULL codes (0/0), which downstream ranking drops."""
    arr = _c(a)
    # let-bind the O(dim) scale out of the per-element lambda (see
    # quantize_int8_stats) — inline, the reduction re-runs per element
    return bind(
        int8_scale(arr),
        lambda scale: F.transform(
            arr,
            lambda x: F.greatest(
                F.lit(-127.0),
                F.least(
                    F.lit(127.0),
                    F.round(F.try_divide(x.cast("double"), scale), 0),
                ),
            ),
        ),
    )


def sql_int8_scale(a: str) -> str:
    return (
        f"(list_max(list_transform({a}, x -> abs(CAST(x AS DOUBLE))))"
        f" / nullif(127.0, 0))"
    )


def sql_int8_codes(a: str) -> str:
    scale = sql_int8_scale(a)
    return (
        f"list_transform({a}, x -> greatest(-127.0, least(127.0, "
        f"round(CAST(x AS DOUBLE) / nullif({scale}, 0), 0))))"
    )
