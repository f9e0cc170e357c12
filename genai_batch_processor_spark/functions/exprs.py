"""Column-expression combinators shared across the function library.

``bind`` exists because Spark performs NO common-subexpression
elimination inside higher-order-function lambdas: an outer expression
referenced from a lambda body is re-evaluated once per array element.
Any O(n) expression consumed inside an O(n) lambda silently becomes
O(n²) per row — measured 13-20× slowdowns on shingling and
quantization before these call sites were bound (see
operators/dedup.winnow_from_hashes for the war story).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(value: Column, body) -> Column:
    """Let-binding for column expressions: evaluate ``value`` ONCE and
    pass it to ``body`` as a lambda variable. Implemented as a
    transform over a 1-element array — the standard workaround for the
    missing lambda-interior CSE."""
    return F.element_at(F.transform(F.array(value), body), 1)
