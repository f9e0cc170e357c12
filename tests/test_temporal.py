"""As-of join semantics on hand-built data: boundary equality, tie-break
by seq, inner-vs-left, and per-key isolation."""

from __future__ import annotations

from genai_batch_processor_spark.operators import temporal


def _dfs(spark):
    left = spark.createDataFrame(
        [(1, 100, "l1"), (1, 205, "l2"), (2, 50, "l3"), (3, 10, "l4")],
        ["k", "ts", "name"],
    )
    right = spark.createDataFrame(
        [
            (1, 100, 7, 1.0),   # equal-ts: matches l1 (<= convention)
            (1, 200, 8, 2.0),
            (1, 200, 9, 3.0),   # same ts as above: seq 9 wins
            (2, 60, 10, 4.0),   # after l3: no match for k=2
        ],
        ["k", "ts", "seq", "v"],
    )
    return left, right


def test_asof_inner_semantics(spark):
    left, right = _dfs(spark)
    out = temporal.asof_join(
        left, right, on="k", right_seq="seq", right_cols=["seq", "v"]
    )
    got = {r.name: (r.asof_seq, r.asof_v) for r in out.collect()}
    assert got == {
        "l1": (7, 1.0),   # boundary: right at ts==left.ts matches
        "l2": (9, 3.0),   # latest ts wins; tie on ts broken by seq
    }  # l3: right row is later -> dropped; l4: key 3 has no right rows


def test_asof_left_keeps_unmatched(spark):
    left, right = _dfs(spark)
    out = temporal.asof_join(
        left, right, on="k", right_seq="seq", right_cols=["seq", "v"],
        how="left",
    )
    got = {r.name: r.asof_seq for r in out.collect()}
    assert got["l3"] is None and got["l4"] is None
    assert len(got) == 4


def test_asof_forward_tolerance_and_ties(spark):
    """Forward direction: nearest right at-or-after left.ts; equal-ts
    rights resolve to LOWEST seq; matches beyond tolerance null out
    (how='left') or drop (how='inner')."""
    from pyspark.sql import functions as F

    def with_ts(rows, schema):
        df = spark.createDataFrame(rows, schema)
        return df.withColumn("ts", F.timestamp_micros(F.col("us")))

    left = with_ts(
        [(1, 100_000_000, "a"), (1, 160_000_000, "b"), (2, 10, "c")],
        "k long, us long, name string",
    ).select("k", "ts", "name")
    right = with_ts(
        [
            (1, 90_000_000, 1),   # before "a": never matches forward
            (1, 100_000_000, 5),  # ts tie with "a"
            (1, 100_000_000, 3),  # ts tie: lowest seq must win
            (1, 250_000_000, 7),  # 90s after "b": beyond 50s tolerance
        ],
        "k long, us long, rid long",
    ).select("k", "ts", "rid")

    out = temporal.asof_join(
        left,
        right,
        on="k",
        right_seq="rid",
        right_cols=["rid"],
        direction="forward",
        tolerance_seconds=50,
        how="left",
    )
    got = {
        r.name: r.asof_rid
        for r in out.collect()
    }
    assert got == {"a": 3, "b": None, "c": None}

    inner = temporal.asof_join(
        left,
        right,
        on="k",
        right_seq="rid",
        right_cols=["rid"],
        direction="forward",
        tolerance_seconds=50,
        how="inner",
    )
    assert [r.name for r in inner.collect()] == ["a"]
