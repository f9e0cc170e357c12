"""Shared test helpers: order-insensitive DataFrame vs DuckDB comparison."""

from __future__ import annotations

import math


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 6))
    return repr(v)


def rows_of(df):
    cols = sorted(df.columns)
    return sorted(tuple(_norm(r[c]) for c in cols) for r in df.collect())


def duck_rows(con, sql):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in res.fetchall())


def assert_matches_oracle(df, con, sql):
    s, d = rows_of(df), duck_rows(con, sql)
    assert len(s) == len(d), f"rowcount spark={len(s)} duck={len(d)}"
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"first mismatches: {mismatches[:3]}"
