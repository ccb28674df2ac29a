"""Null-semantics unit layer: the fixture tables are null-free, but the
engine must behave correctly on nullable data (the reference's Record
model treats unset fields as null-like — SURVEY §1.1)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from incubator_flink_old_spark.operators import (
    aggregate,
    co_group,
    distinct,
    join,
)
from incubator_flink_old_spark.operators.aggregates import exact_avg, exact_sum
from incubator_flink_old_spark.sources import from_elements


def _nullable(spark):
    rows = [(1, 10.0), (1, None), (2, None), (None, 5.0), (None, None)]
    return from_elements(spark, rows, "k int, v double")


def test_join_null_keys_never_match(spark):
    left = _nullable(spark)
    right = from_elements(spark, [(1, "a"), (None, "n")], "rk int, tag string")
    out = join(left, right, on=left["k"] == right["rk"]).collect()
    # SQL equality: NULL keys match nothing (both sides)
    assert all(r["k"] == 1 and r["rk"] == 1 for r in out)
    assert len(out) == 2


def test_aggregate_skips_nulls(spark):
    out = aggregate(
        _nullable(spark),
        ["k"],
        exact_sum("v").alias("s"),
        F.count("v").alias("n_nonnull"),
        F.count(F.lit(1)).alias("n_rows"),
    ).collect()
    got = {r["k"]: (r["s"], r["n_nonnull"], r["n_rows"]) for r in out}
    assert got[1] == (10.0, 1, 2)
    assert got[2] == (None, 0, 1)  # all-null group: SUM=NULL, COUNT=0
    assert got[None] == (5.0, 1, 2)  # NULL is a grouping value


def test_exact_avg_null_handling(spark):
    out = (
        _nullable(spark)
        .groupBy("k")
        .agg(exact_avg("v").alias("a"))
        .collect()
    )
    got = {r["k"]: r["a"] for r in out}
    assert got[1] == 10.0 and got[None] == 5.0 and got[2] is None


def test_distinct_treats_null_as_value(spark):
    out = distinct(_nullable(spark).select("k")).collect()
    assert sorted((r["k"] for r in out), key=lambda x: (x is None, x)) == [1, 2, None]


def test_cogroup_null_keys_group_together(spark):
    left = _nullable(spark).select("k", "v")
    right = from_elements(spark, [(None, 1.5)], "k int, w double")

    def fn(key, lp, rp):
        return pd.DataFrame({"k": [key[0]], "nl": [len(lp)], "nr": [len(rp)]})

    out = co_group(left, right, ["k"], ["k"], fn, "k int, nl long, nr long")
    got = {r["k"]: (r["nl"], r["nr"]) for r in out.collect()}
    # cogroup (like groupBy) treats NULL as a regular grouping value
    assert got[None] == (2, 1)
    assert got[1] == (2, 0)


def test_null_safe_equality_operator(spark):
    left = _nullable(spark)
    right = from_elements(spark, [(None, "n")], "rk int, tag string")
    out = join(left, right, on=left["k"].eqNullSafe(right["rk"])).collect()
    # <=> matches NULL with NULL (the engine exposes both semantics):
    # the two NULL-keyed left rows each pair with the one NULL right row
    assert len(out) == 2
    assert all(r["k"] is None and r["rk"] is None for r in out)
