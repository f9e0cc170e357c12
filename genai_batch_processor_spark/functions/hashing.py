"""Portable deterministic hashing — identical in Spark and ANSI-SQL engines.

Spark's native ``hash``/``xxhash64`` are engine-specific; md5 is not.
``portable_hash60(s)`` = first 15 hex chars of md5(s) as a 60-bit int64:

- Spark:  ``conv(substring(md5(s), 1, 15), 16, 10) :: long``
- DuckDB: ``('0x' || substr(md5(s), 1, 15))::BIGINT``

Verified equal on both engines. All dedup/LSH operators derive their hash
families from this, so every one of them is DuckDB-oracle-checkable
(SURVEY.md §5). The universal-hash family works over a 31-bit Mersenne
prime so intermediate products stay inside int64
(a < 2^31, h < 2^32 ⇒ a*h < 2^63).

Coefficients are derived at import from md5("perm-{i}") — fully
deterministic (no runtime randomness enters any plan) and re-derivable
by any engine.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_31 = (1 << 31) - 1  # 2147483647


def _coeff(tag: str) -> int:
    """Deterministic coefficient in [1, MERSENNE_31) from md5(tag)."""
    h = int(hashlib.md5(tag.encode()).hexdigest()[:15], 16)
    return h % (MERSENNE_31 - 1) + 1


def hash_family(n: int) -> list[tuple[int, int]]:
    """n (a, b) pairs for h_i(x) = (a_i * x + b_i) mod 2^31-1."""
    return [(_coeff(f"perm-a-{i}"), _coeff(f"perm-b-{i}")) for i in range(n)]


# -- Spark side --------------------------------------------------------------


def portable_hash60(col: Column | str) -> Column:
    """60-bit int64 hash of a string column; equals the DuckDB expression
    produced by :func:`sql_hash60`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def portable_hash32(col: Column | str) -> Column:
    """32-bit bucket hash (first 8 hex chars of md5) — fits universal-hash
    arithmetic without int64 overflow."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def universal_hash(h: Column, a: int, b: int) -> Column:
    """(a*h + b) mod 2^31-1 over a 32-bit input hash."""
    return (F.lit(a) % MERSENNE_31 * h + F.lit(b)) % F.lit(MERSENNE_31)


# -- DuckDB-SQL side (oracle fragments) --------------------------------------


def sql_hash60(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def sql_hash32(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def sql_universal_hash(expr: str, a: int, b: int) -> str:
    return f"((({a} % {MERSENNE_31}) * {expr} + {b}) % {MERSENNE_31})"
