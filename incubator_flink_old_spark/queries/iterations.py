"""Iteration & graph t2 queries (SURVEY §2.7 I1–I2, §2.9 G1–G5).

The graph is derived deterministically from the star schema per
FIXTURES.md §2: src = l_orderkey % 200, dst = l_partkey % 200 — identical
expressions on the oracle side, so DuckDB recursive CTEs can check the
iterative fixpoints exactly. KMeans/PageRank have no closed SQL form →
rows-only checks here, invariant-checked in pytest.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from incubator_flink_old_spark.operators.graph import (
    connected_components,
    enum_triangles,
    kmeans,
    page_rank,
    shortest_paths,
    transitive_closure,
)
from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import t

#: Deterministic derived edge set (FIXTURES.md §2): ~200 vertices with
#: multi-component topology at small sf.
EDGES_SQL = """
    SELECT DISTINCT l_orderkey % 200 AS src, l_partkey % 200 AS dst
    FROM lineitem WHERE l_linenumber <= 2 AND l_orderkey % 7 < 3
"""


def edges_df(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_linenumber") <= 2) & (F.col("l_orderkey") % 7 < 3))
        .select(
            (F.col("l_orderkey") % 200).alias("src"),
            (F.col("l_partkey") % 200).alias("dst"),
        )
        .distinct()
    )


@register(
    "q_iterate_cc",
    oracle=f"""
    WITH RECURSIVE edges AS ({EDGES_SQL}),
    sym AS (
        SELECT src, dst FROM edges WHERE src <> dst
        UNION
        SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
    ),
    reach(id, lbl) AS (
        SELECT src AS id, src AS lbl FROM sym
        UNION
        SELECT s.dst AS id, r.lbl
        FROM reach r JOIN sym s ON r.id = s.src
    )
    SELECT id, MIN(lbl) AS component FROM reach GROUP BY id
    """,
)
def q_iterate_cc(spark, sf_dir):
    """I2 flagship: ConnectedComponents via delta iteration (min-label
    propagation, shrinking workset — 'Spinning Fast Iterative Data
    Flows'). Oracle: recursive reachability + MIN label in DuckDB."""
    return connected_components(edges_df(spark, sf_dir), max_iterations=50).select(
        "id", F.col("component").cast("long").alias("component")
    )


@register(
    "q_pregel_sssp",
    oracle=f"""
    WITH RECURSIVE edges AS ({EDGES_SQL}),
    paths(id, d) AS (
        SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS d
        UNION
        SELECT e.dst AS id, p.d + 1 AS d
        FROM paths p JOIN edges e ON p.id = e.src
        WHERE p.d < 50
    )
    SELECT id, MIN(d) AS dist FROM paths GROUP BY id
    """,
)
def q_pregel_sssp(spark, sf_dir):
    """G1: Spargel-style SSSP (hop count from vertex 0, directed edges)
    on the delta-iteration core; oracle via bounded recursive CTE."""
    return shortest_paths(edges_df(spark, sf_dir), source_id=0, max_iterations=50)


@register(
    "q_transitive_closure",
    oracle=f"""
    WITH RECURSIVE edges AS ({EDGES_SQL}),
    uniq AS (SELECT DISTINCT src, dst FROM edges),
    tc(src, dst) AS (
        SELECT src, dst FROM uniq
        UNION
        SELECT t.src, e.dst FROM tc t JOIN uniq e ON t.dst = e.src
    )
    SELECT src, dst FROM tc
    """,
)
def q_transitive_closure(spark, sf_dir):
    """G5/I1: naive transitive closure — bulk iteration to fixpoint with
    count-based convergence (the reference's TransitiveClosureNaive)."""
    return transitive_closure(edges_df(spark, sf_dir), max_iterations=50)


@register(
    "q_triangles",
    oracle=f"""
    WITH edges AS ({EDGES_SQL}),
    canon AS (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM edges WHERE src <> dst
    )
    SELECT ab.a, ab.b, bc.b AS c
    FROM canon ab
    JOIN canon bc ON ab.b = bc.a
    WHERE EXISTS (SELECT 1 FROM canon ac WHERE ac.a = ab.a AND ac.b = bc.b)
    """,
)
def q_triangles(spark, sf_dir):
    """G5: EnumTriangles — pure-relational triad closure (no iteration);
    tests the join-heavy graph path."""
    return enum_triangles(edges_df(spark, sf_dir))


@register("q_iterate_pagerank")  # no closed SQL form → rows-only check
def q_iterate_pagerank(spark, sf_dir):
    """G3/I1: PageRank (10 fixed power iterations, damping 0.85, dangling
    redistribution). Invariants (sum(rank)≈1, n rows = n vertices) are
    pytest-checked; driver does rows-only."""
    return page_rank(edges_df(spark, sf_dir), num_iterations=10)


@register("q_iterate_kmeans")  # no closed SQL form → rows-only check
def q_iterate_kmeans(spark, sf_dir):
    """G4/I1: KMeans (k=3, 10 Lloyd iterations, broadcast centers).
    Points = first two embedding dims; seeds = 3 lowest vec_ids (all
    deterministic). Convergence invariants pytest-checked."""
    emb = t(spark, sf_dir, "embeddings")
    points = emb.select(
        F.col("vec_id").alias("id"),
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    seeds = (
        points.orderBy("id")
        .limit(3)
        .select(F.row_number().over(Window.orderBy("id")).alias("cid"), "x", "y")
    )
    return kmeans(points, seeds, num_iterations=10)


@register(
    "q_wordcount",
    oracle=r"""
    SELECT word, COUNT(*) AS n
    FROM (
        SELECT UNNEST(string_split_regex(LOWER(text), '\s+')) AS word
        FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """,
)
def q_wordcount(spark, sf_dir):
    """G5: WordCount (the reference's hello-world ITCase) over
    documents.text — split, explode, count."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
