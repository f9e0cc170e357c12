"""Scalar/column function library (JVM-side exprs; no Python UDFs here)."""
