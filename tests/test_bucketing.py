"""Bucketed-table co-located join (the 100TB layout story): writing both
fact tables bucketed by the join key lets the join run without ANY
exchange — the engine's answer to the reference's reuse-of-partitioning
optimization (SURVEY §4.1 ship-strategy elision)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_flink_old_spark.plans import explain_str
from incubator_flink_old_spark.sources import load_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    spark.conf.set(
        "spark.sql.sources.bucketing.enabled", "true"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    # disable broadcast so the join strategy is the scale-relevant one
    # (at 100TB neither fact side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("orders_b")
        l = spark.table("lineitem_b")  # noqa: E741
        joined = (
            o.join(l, o["o_orderkey"] == l["l_orderkey"])
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        txt = explain_str(joined.filter(F.col("n") > 0), "formatted")
        # co-located join: no Exchange anywhere — bucketing covers both the
        # join and the following groupBy on the same key
        n_exchanges = txt.count("Exchange")
        assert "SortMergeJoin" in txt
        assert n_exchanges == 0, f"expected shuffle-free bucketed join, got:\n{txt}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_correct(spark, sf_dir, warehouse):
    o = spark.table("orders_b")
    l = spark.table("lineitem_b")  # noqa: E741
    got = o.join(l, o["o_orderkey"] == l["l_orderkey"]).count()
    want = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert got == want
