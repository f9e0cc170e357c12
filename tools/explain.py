"""Print the formatted physical plan of any named query.

    python tools/explain.py <query-name> [sf_dir]
    python tools/explain.py --list

Companion to tests/test_plans.py: the plan assertions there pin the
designed shapes in CI; this prints the full plan for eyeball audits
(PushedFilters, ReadSchema, broadcast vs shuffle, WholeStageCodegen
spans).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if len(sys.argv) < 2 or sys.argv[1] == "--list":
        print("\n".join(sorted(qs)))
        return
    name = sys.argv[1]
    sf_dir = (
        sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    )
    if name not in qs:
        sys.exit(f"unknown query {name!r} — try --list")

    from genai_batch_processor_spark.session import get_spark

    spark = get_spark("explain")
    df = qs[name](spark, sf_dir)
    print(
        spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    )


if __name__ == "__main__":
    main()
