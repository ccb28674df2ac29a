"""Invariant tests for the iterative workloads without SQL oracles
(PageRank, KMeans) plus iteration-core behavior on closed-form graphs.
Mirrors the reference's iterative ITCases (SURVEY §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_flink_old_spark.operators.graph import (
    connected_components,
    kmeans,
    page_rank,
    shortest_paths,
    transitive_closure,
)
from incubator_flink_old_spark.operators.iterations import bulk_iterate, delta_iterate
from incubator_flink_old_spark.queries.iterations import edges_df
from incubator_flink_old_spark.sources import from_elements


@pytest.fixture()
def tiny_graph(spark):
    # two components: {0,1,2,3} chain+cycle, {10,11}; plus dangling 4 (0→4)
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (0, 4), (10, 11)]
    return from_elements(spark, edges, "src long, dst long")


def test_cc_tiny(spark, tiny_graph):
    got = {r["id"]: r["component"] for r in connected_components(tiny_graph).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10}


def test_sssp_tiny(spark, tiny_graph):
    got = {r["id"]: r["dist"] for r in shortest_paths(tiny_graph, 0).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1}  # directed; 10/11 unreachable


def test_transitive_closure_tiny(spark, tiny_graph):
    got = {(r["src"], r["dst"]) for r in transitive_closure(tiny_graph).collect()}
    assert (0, 3) in got and (0, 4) in got and (10, 11) in got
    assert (10, 0) not in got
    # cycle closure: 0 reaches itself
    assert (0, 0) in got


def test_pagerank_invariants(spark, sf_dir):
    pr = page_rank(edges_df(spark, sf_dir), num_iterations=10)
    rows = pr.collect()
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-6  # rank mass conserved incl. dangling
    assert all(r["rank"] > 0 for r in rows)


def test_pagerank_star_prefers_center(spark):
    edges = [(1, 0), (2, 0), (3, 0), (0, 1)]
    pr = page_rank(from_elements(spark, edges, "src long, dst long"), 20)
    got = {r["id"]: r["rank"] for r in pr.collect()}
    assert got[0] == max(got.values())


def test_kmeans_separated_blobs(spark):
    pts = (
        [(i, 0.0 + i * 0.01, 0.0) for i in range(10)]
        + [(100 + i, 10.0 + i * 0.01, 10.0) for i in range(10)]
        + [(200 + i, -10.0 + i * 0.01, 5.0) for i in range(10)]
    )
    points = from_elements(spark, pts, "id long, x double, y double")
    seeds = from_elements(
        spark, [(1, 0.0, 0.0), (2, 10.0, 10.0), (3, -10.0, 5.0)],
        "cid int, x double, y double",
    )
    out = kmeans(points, seeds, num_iterations=5).collect()
    assert len(out) == 3
    assert sorted(r["n_points"] for r in out) == [10, 10, 10]
    # each center near its blob centroid
    for r in out:
        assert abs(r["x"] - round(r["x"] * 0) - {1: 0.045, 2: 10.045, 3: -9.955}[r["cid"]]) < 1e-9


def test_bulk_iterate_convergence_stops_early(spark):
    calls = []

    def step(df, i):
        calls.append(i)
        return df

    def converged(prev, cur, i):
        return True  # converge immediately after first step

    out = bulk_iterate(
        from_elements(spark, [(1,)], "v int"), step, max_iterations=10, converged=converged
    )
    assert calls == [0]
    assert out.count() == 1


def test_delta_iterate_empty_workset_terminates(spark):
    sol = from_elements(spark, [(1, 10)], "id int, value int")
    empty = sol.filter(F.col("id") < 0)
    calls = []

    def step(solution, workset, i):
        calls.append(i)
        return workset, workset

    out = delta_iterate(sol, empty, step, keys=["id"], max_iterations=5)
    assert calls == []  # never stepped
    assert out.count() == 1


def test_generic_pregel_max_propagation(spark, tiny_graph):
    """General pregel with a MAX combiner (direction the min-propagation
    specialization can't do): every vertex learns the max id reachable
    via incoming paths."""
    from pyspark.sql import functions as F

    from incubator_flink_old_spark.operators.graph import pregel

    sym = tiny_graph.union(
        tiny_graph.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    )
    vertices = (
        sym.select(F.col("src").alias("id"))
        .union(sym.select(F.col("dst").alias("id")))
        .distinct()
        .select("id", F.col("id").cast("long").alias("value"))
    )
    out = pregel(
        vertices,
        sym,
        message=F.col("value"),
        combine=F.max("msg"),
        update=F.greatest(F.col("value"), F.col("agg_msg")),
        max_iterations=20,
    )
    got = {r["id"]: r["value"] for r in out.collect()}
    assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4, 10: 11, 11: 11}


def test_kcore_stable_and_min_degree(spark, sf_dir):
    """8 peel rounds reach the fixpoint on the fixture (8 ≡ 10 rounds),
    and the surviving subgraph genuinely has min degree ≥ k."""
    from pyspark.sql import functions as F

    from incubator_flink_old_spark.operators.graph import k_core
    from incubator_flink_old_spark.queries.iterations import edges_df

    edges = edges_df(spark, sf_dir)
    e8 = k_core(edges, k=3, rounds=8)
    rows8 = sorted(tuple(r) for r in e8.collect())
    rows10 = sorted(tuple(r) for r in k_core(edges, k=3, rounds=10).collect())
    assert rows8 == rows10, "fixture graph not stable within 8 peel rounds"
    if rows8:
        deg = (
            e8.select(F.explode(F.array("src", "dst")).alias("id"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        assert deg.agg(F.min("deg")).first()[0] >= 3


def test_label_propagation_deterministic_and_partition_invariant(spark, sf_dir):
    """Fixed-round LPA must produce identical labels under any input
    partitioning (arg-max ties broken by smallest label), and every
    node keeps exactly one label per round."""
    from incubator_flink_old_spark.operators.graph import label_propagation
    from incubator_flink_old_spark.queries.iterations import edges_df

    edges = edges_df(spark, sf_dir)
    a = sorted(tuple(r) for r in label_propagation(edges, rounds=3).collect())
    b = sorted(
        tuple(r)
        for r in label_propagation(edges.repartition(13), rounds=3).collect()
    )
    assert a == b
    ids = [i for i, _ in a]
    assert len(ids) == len(set(ids))  # one label per node
