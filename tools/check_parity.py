"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf dir, then compares row count, column names/types,
and order-insensitive values. Usage:

    python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from genai_batch_processor_spark.session import get_spark
from genai_batch_processor_spark.sources.tables import TABLE_NAMES


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def norm_val(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def compare(name, sdf, con, sql):
    t0 = time.time()
    spark_rows = [tuple(norm_val(v) for v in r) for r in sdf.collect()]
    spark_cols = sdf.columns
    t1 = time.time()
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(norm_val(v) for v in r) for r in res.fetchall()]
    t2 = time.time()

    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
    if not problems:
        # sort columns by name, then rows
        sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
        didx = [duck_cols.index(c) for c in sorted(duck_cols)]
        skey = sorted(tuple(repr(r[i]) for i in sidx) for r in spark_rows)
        dkey = sorted(tuple(repr(r[i]) for i in didx) for r in duck_rows)
        if skey != dkey:
            diffs = [(a, b) for a, b in zip(skey, dkey) if a != b][:3]
            problems.append(f"values differ; first diffs: {diffs}")
    status = "OK " if not problems else "FAIL"
    print(f"{status} {name:28s} spark={t1 - t0:5.1f}s duck={t2 - t1:5.1f}s "
          f"rows={len(spark_rows)}")
    for p in problems:
        print(f"     {p}")
    return not problems


def main():
    from tools._args import positional

    args = positional(usage="usage: check_parity.py [sf_dir] [query ...]")
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    spark = get_spark("parity_check")
    con = duck_con(sf_dir)
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    ok = True
    n_ok = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in sqls:
            n = fn(spark, sf_dir).count()
            print(f"SKIP {name:28s} (no oracle; rows={n})")
            continue
        try:
            good = compare(name, fn(spark, sf_dir), con, sqls[name])
        except Exception as e:
            good = False
            print(f"FAIL {name:28s} EXC {type(e).__name__}: {e}")
        ok &= good
        n_ok += good
        n_fail += not good
    print(f"== {n_ok} ok, {n_fail} fail ==")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
