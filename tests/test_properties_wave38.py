"""Property-based tests for the round-5 operators: SCC against a
brute-force Python reference on random digraphs, and the SQ8 scalar
quantizer's algebraic laws on random integer-grid frames. Example
counts are low (each example runs Spark jobs)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from incubator_flink_old_spark.sources import from_elements

SETTINGS = dict(max_examples=8, deadline=None)


def _brute_scc(n: int, edges: set[tuple[int, int]]) -> dict[int, int]:
    """Reference SCC via Floyd-Warshall reachability: scc_id(v) = min
    node mutually reachable with v (including v)."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    reach = {v: {v} for v in nodes}
    for v in nodes:
        frontier = {v}
        while frontier:
            nxt = {
                b for a, b in edges if a in reach[v] and b not in reach[v]
            }
            reach[v] |= nxt
            frontier = nxt
    out = {}
    for v in nodes:
        mutual = [u for u in nodes if u in reach[v] and v in reach[u]]
        out[v] = min(mutual)
    return out


edge_lists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1,
    max_size=18,
).map(set)


@given(edges=edge_lists)
@settings(**SETTINGS)
def test_scc_matches_bruteforce_on_random_digraphs(spark, edges):
    """transitive-closure-based SCC (the q_scc construction) must agree
    with Floyd-Warshall mutual reachability on any small digraph."""
    from incubator_flink_old_spark.operators.graph import transitive_closure

    df = from_elements(spark, sorted(edges), "src long, dst long")
    tc = transitive_closure(df, max_iterations=15)
    rev = tc.select(F.col("dst").alias("r_src"), F.col("src").alias("r_dst"))
    mutual = tc.join(
        rev, (tc.src == F.col("r_src")) & (tc.dst == F.col("r_dst"))
    ).select(F.col("src").alias("id"), F.col("dst").alias("other"))
    verts = (
        df.select(F.col("src").alias("id"))
        .union(df.select(F.col("dst").alias("id")))
        .distinct()
    )
    mutual = mutual.union(verts.select("id", F.col("id").alias("other")))
    got = {
        r.id: r.scc_id
        for r in mutual.groupBy("id")
        .agg(F.min("other").alias("scc_id"))
        .collect()
    }
    assert got == _brute_scc(10, edges)


grid_vectors = st.lists(
    st.lists(st.integers(-(10**6), 10**6), min_size=3, max_size=3),
    min_size=2,
    max_size=12,
)


@given(vecs=grid_vectors)
@settings(**SETTINGS)
def test_sq8_quantizer_laws(spark, vecs):
    """The SQ8 code rule (v − lo)·255 div (hi − lo) must satisfy, per
    dimension: codes within [0, 255]; lo → 0 and hi → 255 (endpoint
    coverage); monotonicity in v; and the reconstruction error bound
    |v − (lo + c·(hi − lo)/255)| ≤ (hi − lo)/255 (one quantization
    step)."""
    rows = [(i, v[0], v[1], v[2]) for i, v in enumerate(vecs)]
    df = from_elements(spark, rows, "i long, d0 long, d1 long, d2 long")
    dims = df.selectExpr(
        "i", "stack(3, 0, d0, 1, d1, 2, d2) AS (p, v)"
    )
    mm = dims.groupBy("p").agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    coded = dims.join(mm, on="p").select(
        "p",
        "v",
        "lo",
        "hi",
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(F.expr("(v - lo) * 255 div (hi - lo)"))
        .alias("c"),
    ).collect()
    by_dim: dict[int, list] = {}
    for r in coded:
        assert 0 <= r.c <= 255
        if r.hi != r.lo:
            step = (r.hi - r.lo) / 255.0
            recon = r.lo + r.c * step
            assert abs(r.v - recon) <= step + 1e-9
        by_dim.setdefault(r.p, []).append((r.v, r.c))
    for vals in by_dim.values():
        vals.sort()
        codes = [c for _, c in vals]
        assert codes == sorted(codes)  # monotone in v
        assert codes[0] == 0 and codes[-1] in (255, 0)  # endpoints
