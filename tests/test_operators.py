"""Unit tests for operator paths not covered by the SQL oracle gate:
pandas-backed coGroup/groupReduce/secondary sort, rich-UDF lifecycle,
broadcast sets, accumulators (observe), and the source/sink helpers.
Mirrors the reference's operator-level JUnit layer (SURVEY §5)."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Observation
from pyspark.sql import functions as F

from incubator_flink_old_spark.functions import (
    RichMapFunction,
    apply_rich,
    histogram,
    long_counter,
    with_broadcast_set,
)
from incubator_flink_old_spark.operators import (
    co_group,
    group_reduce,
    secondary_sort_apply,
)
from incubator_flink_old_spark.operators.relational import map_pandas
from incubator_flink_old_spark.sources import (
    from_elements,
    generate_sequence,
    read_csv,
    read_text,
    write_sorted,
)


def test_cogroup_fires_on_one_sided_keys(spark):
    """SURVEY §7.3 hard part 2: groups with no partner still fire."""
    left = from_elements(spark, [(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    right = from_elements(spark, [(2, 10.0), (3, 30.0)], "k int, w double")

    def fn(key, lpdf, rpdf):
        return pd.DataFrame(
            {"k": [key[0]], "n_left": [len(lpdf)], "n_right": [len(rpdf)]}
        )

    out = co_group(left, right, ["k"], ["k"], fn, "k int, n_left long, n_right long")
    got = {r["k"]: (r["n_left"], r["n_right"]) for r in out.collect()}
    # key 1 left-only, key 3 right-only — both must fire with an empty side
    assert got == {1: (2, 0), 2: (1, 1), 3: (0, 1)}


def test_group_reduce_whole_group(spark):
    df = from_elements(
        spark, [(1, 5.0), (1, 7.0), (2, 1.0)], "k int, v double"
    )

    def span(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"k": [pdf["k"].iloc[0]], "span": [pdf["v"].max() - pdf["v"].min()]}
        )

    out = group_reduce(df, ["k"], span, "k int, span double")
    got = {r["k"]: r["span"] for r in out.collect()}
    assert got == {1: 2.0, 2: 0.0}


def test_secondary_sort_order_inside_group(spark):
    df = from_elements(
        spark,
        [(1, 3, "c"), (1, 1, "a"), (1, 2, "b"), (2, 9, "z")],
        "k int, seq int, tag string",
    )

    def concat_in_order(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], "joined": ["".join(pdf["tag"])]})

    out = secondary_sort_apply(
        df, ["k"], [("seq", True)], concat_in_order, "k int, joined string"
    )
    got = {r["k"]: r["joined"] for r in out.collect()}
    assert got == {1: "abc", 2: "z"}  # ordered by secondary key within group


def test_rich_function_lifecycle(spark):
    class AddBias(RichMapFunction):
        def open(self, config):
            self.bias = config["bias"]

        def map(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.assign(v=batch["v"] + self.bias)

    df = from_elements(spark, [(1, 1.0), (2, 2.0)], "k int, v double")
    out = apply_rich(df, AddBias(), "k int, v double", config={"bias": 10.0})
    assert sorted(r["v"] for r in out.collect()) == [11.0, 12.0]


def test_map_pandas_changes_arity(spark):
    df = from_elements(spark, [(1,), (2,), (3,)], "k int")
    out = map_pandas(df, lambda pdf: pdf[pdf["k"] > 1], "k int")
    assert sorted(r["k"] for r in out.collect()) == [2, 3]


def test_broadcast_set(spark):
    small = from_elements(spark, [(1, "one"), (2, "two")], "k int, name string")
    bc = with_broadcast_set(spark, small, "names")
    lookup = {r["k"]: r["name"] for r in bc.value}
    assert lookup == {1: "one", 2: "two"}


def test_observe_accumulators(spark):
    df = generate_sequence(spark, 1, 100)
    obs = Observation("counters")
    observed = df.observe(obs, long_counter("*", "n"), F.sum("id").alias("total"))
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get == {"n": 100, "total": 5050}


def test_histogram(spark):
    df = from_elements(spark, [(1,), (1,), (2,)], "v int")
    got = {r["v"]: r["count"] for r in histogram(df, "v").collect()}
    assert got == {1: 2, 2: 1}


def test_text_and_csv_sources(spark, tmp_path):
    p = tmp_path / "in.txt"
    p.write_text("alpha\nbeta\n")
    assert sorted(r["value"] for r in read_text(spark, str(p)).collect()) == [
        "alpha",
        "beta",
    ]
    c = tmp_path / "in.csv"
    c.write_text("1|x\n2|y\n")
    df = read_csv(spark, str(c), "k int, v string", sep="|", included_fields=["v"])
    assert df.columns == ["v"]
    assert sorted(r["v"] for r in df.collect()) == ["x", "y"]


def test_write_sorted_global_order(spark, tmp_path):
    """S12: concatenated output partitions form a total order."""
    df = generate_sequence(spark, 1, 1000).select(
        (F.col("id") * 37 % 1000).alias("v")
    )
    out = str(tmp_path / "sorted")
    write_sorted(df.repartition(8), out, ["v"])
    back = spark.read.parquet(out)
    # per-file minima must be non-decreasing with sorted file names AND
    # every file internally sorted → spot-check via full read order
    files = sorted(
        f for f in os.listdir(out) if f.endswith(".parquet")
    )
    last_max = None
    for fname in files:
        vals = [r["v"] for r in spark.read.parquet(f"{out}/{fname}").collect()]
        assert vals == sorted(vals)
        if vals:
            if last_max is not None:
                assert vals[0] >= last_max
            last_max = vals[-1]
    assert back.count() == 1000


def test_approx_count_distinct_close(spark, sf_dir):
    from incubator_flink_old_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.count_distinct("l_partkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_partkey", 0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.1


def test_salted_join_matches_plain_join(spark):
    """Salted join must be result-identical to the plain join on skewed
    data (one key holding most rows)."""
    from incubator_flink_old_spark.operators.joins import salted_join

    left = from_elements(
        spark,
        [(1, i) for i in range(500)] + [(2, 1), (3, 2)],
        "k int, payload int",
    )
    right = from_elements(spark, [(1, "hot"), (2, "a"), (4, "d")], "rk int, name string")
    salted = salted_join(left, right, "k", "rk", salt=4)
    plain = left.join(right, left["k"] == right["rk"])
    assert salted.count() == plain.count() == 501
    s = sorted((r["k"], r["payload"], r["name"]) for r in salted.collect())
    p = sorted((r["k"], r["payload"], r["name"]) for r in plain.collect())
    assert s == p


def test_oracle_results_partition_independent(spark, sf_dir):
    """End-to-end determinism: the flagship aggregation query returns
    bit-identical rows regardless of shuffle parallelism (the property
    the decimal routing buys — retries/speculation at scale reorder
    partials)."""
    from incubator_flink_old_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, QUERIES["q_tpch_q1"](spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, QUERIES["q_tpch_q1"](spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_distributed_cache_file(spark, tmp_path):
    """F3: DistributedCache — a shipped file readable inside a UDF on the
    executor side via SparkFiles."""
    from incubator_flink_old_spark.functions import distributed_cache_file

    p = tmp_path / "lookup.txt"
    p.write_text("42")
    distributed_cache_file(spark, str(p))

    def read_side_file(batch: pd.DataFrame) -> pd.DataFrame:
        from pyspark import SparkFiles

        with open(SparkFiles.get("lookup.txt")) as f:
            bias = int(f.read())
        return batch.assign(v=batch["v"] + bias)

    df = from_elements(spark, [(1, 1), (2, 2)], "k int, v int")
    out = map_pandas(df, read_side_file, "k int, v int")
    assert sorted(r["v"] for r in out.collect()) == [43, 44]


def test_global_row_number_matches_window(spark, sf_dir):
    """Distributed rank must equal the single-partition window's
    row_number over the same tie-broken total order."""
    from pyspark.sql import Window

    from incubator_flink_old_spark.operators.aggregates import global_row_number
    from incubator_flink_old_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    got = {
        r["o_orderkey"]: r["rn"]
        for r in global_row_number(orders, order, num_partitions=7).collect()
    }
    w = Window.orderBy(*order)
    want = {
        r["o_orderkey"]: r["rn"]
        for r in orders.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want
