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


def _pagerank_oracle(iters: int = 10) -> str:
    """Value-checked PageRank oracle: the fixed power iteration UNROLLED as
    one CTE per round (a fixed-iteration loop IS SQL-expressible — the
    'no closed form' caveat only applies to convergence-driven loops).
    Expressions mirror operators/graph.page_rank structurally — same
    literal forms ((1.0-0.85), 0.85), same operator order — so the only
    cross-engine divergence is double-sum accumulation order, washed out
    by the 6dp rounding both sides apply. Every pr{{i}} is MATERIALIZED:
    each is referenced twice (gather + dangling), and an inlining planner
    would otherwise expand the 10-round chain exponentially."""
    sql = [
        f"WITH edges AS MATERIALIZED ({EDGES_SQL}),",
        "verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges),",
        "nn AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS n FROM verts),",
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),",
        "pr0 AS MATERIALIZED (SELECT id, 1.0::DOUBLE / nn.n AS rank FROM verts CROSS JOIN nn),",
    ]
    for i in range(iters):
        sql.append(
            f"""g{i} AS MATERIALIZED (
        SELECT e.dst AS id, SUM(p.rank / d.deg) AS gathered
        FROM edges e JOIN pr{i} p ON e.src = p.id JOIN deg d ON d.src = e.src
        GROUP BY e.dst),
    dang{i} AS MATERIALIZED (
        SELECT COALESCE(SUM(p.rank), 0.0::DOUBLE) AS m FROM pr{i} p
        WHERE p.id NOT IN (SELECT src FROM edges)),
    pr{i + 1} AS MATERIALIZED (
        SELECT v.id,
               (1.0::DOUBLE - 0.85) / nn.n
                 + 0.85 * dang{i}.m / nn.n
                 + 0.85 * COALESCE(g{i}.gathered, 0.0::DOUBLE) AS rank
        FROM verts v CROSS JOIN nn CROSS JOIN dang{i}
        LEFT JOIN g{i} ON v.id = g{i}.id),"""
        )
    sql.append(f"fin AS (SELECT 1)\nSELECT id, ROUND(rank, 6) AS rank FROM pr{iters}")
    return "\n    ".join(sql)


@register("q_iterate_pagerank", oracle=_pagerank_oracle(10))
def q_iterate_pagerank(spark, sf_dir):
    """G3/I1: PageRank (10 fixed power iterations, damping 0.85, dangling
    redistribution). Value-checked: the oracle unrolls the same 10 rounds
    in DuckDB; both sides round ranks to 6dp (double-sum order drift is
    ≤1e-13 — far inside the grid). sum(rank)≈1 is pytest-checked."""
    out = page_rank(edges_df(spark, sf_dir), num_iterations=10)
    return out.select("id", F.round("rank", 6).alias("rank"))


def _kmeans_oracle(iters: int = 10, k: int = 3) -> str:
    """Value-checked KMeans oracle: fixed Lloyd iterations unrolled, one
    assign+recompute CTE pair per round. Tie-break mirrors the engine's
    min_by(cid, struct(d2, cid)) via ROW_NUMBER ORDER BY d2, cid; the
    distance uses the same power() expression shape."""
    sql = [
        "WITH pts AS (SELECT vec_id AS id, embedding[1]::DOUBLE AS x,",
        "                    embedding[2]::DOUBLE AS y FROM embeddings),",
        f"""c0 AS (
        SELECT ROW_NUMBER() OVER (ORDER BY id) AS cid, x, y
        FROM (SELECT id, x, y FROM pts ORDER BY id LIMIT {k})),""",
    ]
    for i in range(iters + 1):
        sql.append(
            f"""s{i} AS (
        SELECT p.id, p.x, p.y, c.cid,
               power(p.x - c.x, 2) + power(p.y - c.y, 2) AS d2
        FROM pts p CROSS JOIN c{i} c),
    a{i} AS (
        SELECT id, x, y, cid FROM (
            SELECT id, x, y, cid,
                   ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
            FROM s{i}) WHERE rn = 1),"""
        )
        if i < iters:
            sql.append(
                f"""c{i + 1} AS (
        SELECT cid, AVG(x) AS x, AVG(y) AS y FROM a{i} GROUP BY cid),"""
            )
    sql.append(
        f"""cnt AS (SELECT cid, COUNT(*) AS n_points FROM a{iters} GROUP BY cid)
    SELECT c.cid, ROUND(c.x, 6) AS x, ROUND(c.y, 6) AS y,
           COALESCE(cnt.n_points, 0) AS n_points
    FROM c{iters} c LEFT JOIN cnt ON c.cid = cnt.cid"""
    )
    return "\n    ".join(sql)


@register("q_iterate_kmeans", oracle=_kmeans_oracle(10, 3))
def q_iterate_kmeans(spark, sf_dir):
    """G4/I1: KMeans (k=3, 10 Lloyd iterations, broadcast centers).
    Points = first two embedding dims; seeds = 3 lowest vec_ids. Value-
    checked: the oracle unrolls the same 10 Lloyd rounds in DuckDB;
    centers rounded to 6dp on both sides."""
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
    out = kmeans(points, seeds, num_iterations=10)
    return out.select(
        "cid",
        F.round("x", 6).alias("x"),
        F.round("y", 6).alias("y"),
        "n_points",
    )


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
