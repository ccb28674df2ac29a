"""scc_forward_backward (the scalable SCC path q_scc's docstring
promises) — checked against the closure construction on the fixture
graph and against a Floyd-Warshall brute reference on random digraphs,
including the trim-only (DAG) and fallback-exercising shapes."""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from incubator_flink_old_spark.sources import from_elements

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

SETTINGS = dict(max_examples=6, deadline=None)


def _brute_scc(edges: set[tuple[int, int]]) -> dict[int, int]:
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    reach = {v: {v} for v in nodes}
    for v in nodes:
        frontier = {v}
        while frontier:
            nxt = {b for a, b in edges if a in reach[v] and b not in reach[v]}
            reach[v] |= nxt
            frontier = nxt
    return {
        v: min(u for u in nodes if u in reach[v] and v in reach[u])
        for v in nodes
    }


@pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")
def test_fb_matches_closure_on_fixture(spark):
    """Forward-backward must produce exactly q_scc's answer on the
    fixture graph (same min-member labelling)."""
    from incubator_flink_old_spark.operators.graph import scc_forward_backward
    from incubator_flink_old_spark.queries.iterations import edges_df
    from incubator_flink_old_spark.queries.llm_ops20 import q_scc

    closure = {(r.id, r.scc_id) for r in q_scc(spark, SF).collect()}
    fb = {
        (r.id, r.scc_id)
        for r in scc_forward_backward(edges_df(spark, SF)).collect()
    }
    assert fb == closure


def test_fb_trim_decomposes_dag(spark):
    """A pure DAG must fully decompose by trimming alone (every vertex a
    singleton SCC) — no pivot round should be needed for correctness."""
    from incubator_flink_old_spark.operators.graph import scc_forward_backward

    dag = [(i, i + 1) for i in range(6)] + [(0, 3), (2, 5)]
    df = from_elements(spark, dag, "src long, dst long")
    got = {r.id: r.scc_id for r in scc_forward_backward(df).collect()}
    assert got == {v: v for v in range(7)}


def test_fb_two_cycles_bridged(spark):
    """Two 3-cycles joined by a bridge: exactly two non-trivial SCCs,
    labelled by their min members."""
    from incubator_flink_old_spark.operators.graph import scc_forward_backward

    edges = [(0, 1), (1, 2), (2, 0), (2, 10), (10, 11), (11, 12), (12, 10)]
    df = from_elements(spark, edges, "src long, dst long")
    got = {r.id: r.scc_id for r in scc_forward_backward(df).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}


edge_lists = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)),
    min_size=1,
    max_size=16,
).map(set)


@given(edges=edge_lists)
@settings(**SETTINGS)
def test_fb_matches_bruteforce_on_random_digraphs(spark, edges):
    from incubator_flink_old_spark.operators.graph import scc_forward_backward

    df = from_elements(spark, sorted(edges), "src long, dst long")
    got = {
        r.id: r.scc_id
        for r in scc_forward_backward(df, max_iterations=12).collect()
    }
    want = {v: s for v, s in _brute_scc(edges).items()}
    # self-loop-only vertices: edges (v,v) are dropped by the operator's
    # src != dst filter but the vertex itself must still be assigned
    assert got == want


def test_fb_large_diameter_cycle_is_one_scc(spark):
    """A 40-vertex directed cycle (diameter 39, past the old 30-round
    reachability cap) must come back as ONE SCC — the regression that
    motivated running _reach_from to drain instead of to a budget
    (a capped frontier silently truncated F∩B and split the cycle)."""
    from incubator_flink_old_spark.operators.graph import scc_forward_backward

    n = 40
    cyc = [(i, (i + 1) % n) for i in range(n)]
    df = from_elements(spark, cyc, "src long, dst long")
    rows = scc_forward_backward(df).collect()
    assert len(rows) == n  # no duplicate ids from multi-pivot dedup
    assert {r.id: r.scc_id for r in rows} == {v: 0 for v in range(n)}


def test_fb_fallback_path_is_exact(spark):
    """With max_pivot_rounds=0 every vertex goes through the closure
    fallback — the answer must be identical."""
    from incubator_flink_old_spark.operators.graph import scc_forward_backward

    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2)]
    df = from_elements(spark, edges, "src long, dst long")
    got = {
        r.id: r.scc_id
        for r in scc_forward_backward(df, max_pivot_rounds=0).collect()
    }
    assert got == {0: 0, 1: 0, 2: 2, 3: 2}
