"""DataSet-API parity tests: reference-style programs written against the
fluent surface (SURVEY §3.1's lifecycle: build DAG → register sinks →
env.execute())."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from incubator_flink_old_spark.api import ExecutionEnvironment


def env_for(spark):
    return ExecutionEnvironment.get_execution_environment(spark)


def test_wordcount_program(spark, sf_dir, tmp_path):
    """The reference's hello-world, statement-for-statement."""
    env = env_for(spark)
    docs = env.read_table(sf_dir, "documents")
    counts = (
        docs.flat_map_expr(F.explode(F.split(F.lower("text"), r"\s+")), "word")
        .filter(F.col("word") != "")
        .group_by("word")
        .count("n")
    )
    out = str(tmp_path / "wc")
    counts.write_as_csv(out, order=[F.col("n").desc(), F.col("word")])
    assert env.execute("WordCount") == 1
    back = spark.read.option("header", "true").csv(out)
    assert int(back.count()) == counts.count()


def test_tpch_q3_program(spark, sf_dir):
    env = env_for(spark)
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = env.read_table(sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = env.read_table(sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = env.read_table(sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    joined = (
        li.join(orders).where("l_orderkey").equal_to("o_orderkey")
        .join_with_tiny(cust).where("o_custkey").equal_to("c_custkey")
    )
    top = (
        joined.group_by("l_orderkey", "o_orderdate")
        .aggregate(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(27,6)"))
            .cast("double")
            .alias("revenue")
        )
        .order_by(F.col("revenue").desc(), F.col("l_orderkey"))
        .first(10)
    )
    rows = top.collect()
    assert len(rows) == 10
    # same result as the registry query
    from incubator_flink_old_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    want = QUERIES["q_tpch_q3"](spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in want]


def test_cogroup_and_secondary_sort_via_api(spark):
    env = env_for(spark)
    left = env.from_elements([(1, "x"), (2, "y")], "k int, v string")
    right = env.from_elements([(2, 20.0), (3, 30.0)], "k int, w double")

    def cg(key, lp, rp):
        return pd.DataFrame({"k": [key[0]], "nl": [len(lp)], "nr": [len(rp)]})

    got = {
        r["k"]: (r["nl"], r["nr"])
        for r in left.co_group(right).where("k").equal_to("k").apply(
            cg, "k int, nl long, nr long"
        ).collect()
    }
    assert got == {1: (1, 0), 2: (1, 1), 3: (0, 1)}

    data = env.from_elements(
        [(1, 2, "b"), (1, 1, "a"), (2, 5, "z")], "k int, seq int, tag string"
    )

    def concat(pdf):
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], "s": ["".join(pdf["tag"])]})

    got2 = {
        r["k"]: r["s"]
        for r in data.group_by("k").sort_group("seq").reduce_group(
            concat, "k int, s string"
        ).collect()
    }
    assert got2 == {1: "ab", 2: "z"}


def test_delta_iteration_via_api(spark):
    """CC on a tiny graph through the fluent iterate_delta surface."""
    env = env_for(spark)
    edges = [(0, 1), (1, 2), (10, 11)]
    sym = edges + [(b, a) for a, b in edges]
    e = env.from_elements(sym, "src long, dst long")
    vertices = env.from_elements(
        [(v, v) for v in {x for p in sym for x in p}], "id long, value long"
    )

    def step(solution, workset, i):
        msgs = (
            workset.join(e).where("id").equal_to("src")
            .map(F.col("dst").alias("id"), F.col("value").alias("cand"))
            .group_by("id")
            .min("cand", "cand")
        )
        improved = (
            msgs.join(solution).where("id").equal_to("id")
            .filter(F.col("cand") < F.col("value"))
            .map(F.col("id"), F.col("cand").alias("value"))
        )
        return improved, improved

    out = vertices.iterate_delta(vertices, 20, ["id"], step)
    got = {r["id"]: r["value"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}


def test_multi_sink_execute(spark, sf_dir, tmp_path):
    env = env_for(spark)
    nation = env.read_table(sf_dir, "nation")
    nation.project("n_name").write_as_text(str(tmp_path / "names"))
    nation.group_by("n_regionkey").count("n").write_as_parquet(str(tmp_path / "by_region"))
    assert env.execute("multi") == 2
    assert spark.read.text(str(tmp_path / "names")).count() == 25
    assert spark.read.parquet(str(tmp_path / "by_region")).count() == 5
    assert env.execute("again") == 0  # sinks drained

def test_llm_pipeline_fluent_surface(spark):
    """The fluent DataSet API exposes the curation operators end-to-end:
    chunk -> stratified sample -> exact dedup stats."""
    from incubator_flink_old_spark.api import ExecutionEnvironment

    env = ExecutionEnvironment.get_execution_environment(spark)
    docs = env.from_elements(
        [
            (1, "the quick brown fox jumps over the lazy dog again", "en"),
            (2, "the quick brown fox jumps over the lazy dog again", "en"),
            (3, "der schnelle braune fuchs und der faule hund", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    chunks = docs.chunk(chunk_tokens=4, overlap=1)
    rows = chunks.collect()
    assert {r["doc_id"] for r in rows} == {1, 2, 3}
    assert all(r["n_chunk_tokens"] <= 4 for r in rows)

    sampled = docs.sample_stratified("lang", {"en": 1.0, "de": 0.0})
    assert {r["doc_id"] for r in sampled.collect()} == {1, 2}

    dd = docs.dedup_exact().collect()
    by_canon = {r["canonical_id"]: r["n_copies"] for r in dd}
    assert by_canon[1] == 2 and by_canon[3] == 1

    clusters = docs.dedup_clusters()
    kept = {r["doc_id"] for r in clusters.collect() if r["keep"]}
    assert kept == {1, 3}


def test_linkage_fluent_surface(spark, sf_dir):
    """Wave-5..8 fluent parity: template dedup, fuzzy linkage, entity
    resolution, tokenizer application, corpus diff."""
    env = env_for(spark)
    parts = env.read_table(sf_dir, "part")
    pairs = parts.fuzzy_pairs(key="p_partkey", name="p_name", max_dist=4)
    assert {"name_a", "name_b", "dist"} <= set(pairs.df.columns)
    ents = parts.resolve_entities(key="p_partkey", name="p_name")
    assert ents.count() == parts.df.select("p_name").distinct().count()

    docs = env.read_table(sf_dir, "documents")
    ids = docs.tokenize(vocab_size=50, max_len=8)
    assert ids.count() == docs.count()
    diff = docs.diff_against(docs)
    assert {r["status"] for r in diff.collect()} == {"unchanged"}
    assert docs.dedup_templates().count() == 0  # random text: no templates


def test_fluent_sketch_and_ann_surface(spark, sf_dir):
    from incubator_flink_old_spark.api import ExecutionEnvironment
    from pyspark.sql import functions as F

    env = ExecutionEnvironment.get_execution_environment(spark)
    docs = env.read_table(sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    plain = docs.decontaminate(bench)
    bloomed = docs.decontaminate(bench, bloom=True)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bloomed.collect())
    )

    emb = env.read_table(sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).map(
        F.col("vec_id").alias("q_id"), F.col("embedding")
    )
    hits = emb.ann_topk(q, k=3, method="ivfpq", n_cells=4, n_probe=4,
                        m=8, n_centroids=4, kmeans_iters=1)
    got = {(r["q_id"], r["vec_id"]) for r in hits.collect()}
    assert all((i, i) in got for i in range(3))
