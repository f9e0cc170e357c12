"""Property-based tests (hypothesis): both distributed connected-
components algorithms must agree with a pure-Python union-find on
arbitrary random pair graphs — not just the shapes we thought to write
down. Spark jobs are slow per example, so the example budget is small
and the graphs are bounded; hypothesis still explores chains, stars,
cliques, self-loops, duplicate edges, and disconnected islands far more
ruthlessly than hand-picked cases."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from genai_batch_processor_spark.operators import dedup


def union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_components_match_union_find(spark, edges):
    # both operators drop self-loops (a node paired only with itself is
    # not a duplicate) — the reference union-find sees the same edges
    real_edges = [(a, b) for a, b in edges if a != b]
    expected = union_find(real_edges)
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    lp = {
        r.doc_id: r.component_id
        for r in dedup.connected_components(pairs, max_iter=40).collect()
    }
    star = {
        r.doc_id: r.component_id
        for r in dedup.connected_components_star(pairs).collect()
    }
    assert lp == expected
    assert star == expected
