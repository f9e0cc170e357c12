"""The one clamp behind every corpus-derived default (round-6 review:
three modules had hand-rolled copies of the same expression, and the
SQL twin was re-inlined once — four sites that could drift
independently at the next tuning change).

``clamped_linear(n, base, ceil, per)`` = ``clamp(n // per, base, ceil)``
— monotone in ``n`` (property-tested via each wrapper), equal to
``base`` at every oracle-fixture scale by construction of each caller's
constants. ``sql_clamped_linear`` is the DuckDB twin as a scalar
subquery over the SAME relation the Spark side counts, which is what
keeps cap parity data-dependent instead of fixture-lucky.

Wrappers with their module's constants: ``dedup.adaptive_max_bucket``,
``linkage.adaptive_max_block``, ``clustering.adaptive_k``.
"""

from __future__ import annotations


def clamped_linear(n: int, base: int, ceil: int, per: int) -> int:
    """``clamp(n // per, base, ceil)`` — the corpus-derived default."""
    return max(base, min(ceil, int(n) // per))


def sql_clamped_linear(table: str, base: int, ceil: int, per: int) -> str:
    """DuckDB twin of :func:`clamped_linear` with ``n = count(*) FROM
    table``, as a scalar subquery."""
    return (
        f"(SELECT greatest({base}, least({ceil}, count(*) // {per})) "
        f"FROM {table})"
    )
