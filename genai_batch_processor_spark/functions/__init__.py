"""Scalar/column function library. JVM-side expressions throughout,
with one deliberate Python boundary: ``bpe.py``'s Arrow-batched
subword token count (a vendored byte-level BPE cannot be a Catalyst
expression; it ships as a ``pandas_udf`` with a per-executor memo)."""
