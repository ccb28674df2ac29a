"""Aggregation & grouped-program t2 queries (SURVEY §2.4 A1–A8, §2.5 O1).

The reference's built-in agg library is exactly SUM/MIN/MAX
(api/java/aggregation/Aggregations); COUNT/AVG/COUNT DISTINCT were
user-composed and cube/rollup/grouping-sets did not exist. The engine
exposes the idiomatic superset; everything here is map-side-combinable
hash aggregation (the reference was sort-based only — SURVEY §2.4 A6).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from incubator_flink_old_spark.operators import aggregate, top_k_per_group
from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import davg, dsum, sql_davg, sql_dsum, t


@register(
    "q_groupby_reduce_sum",
    oracle=f"""
    SELECT l_suppkey, {sql_dsum('l_quantity')} AS total_qty,
           COUNT(*) AS n_items
    FROM lineitem GROUP BY l_suppkey
    """,
)
def q_groupby_reduce_sum(spark, sf_dir):
    """A1: groupBy(keys).reduce — associative per-key reduce; Spark's
    partial aggregation is the reference's map-side combiner, built-in."""
    return aggregate(
        t(spark, sf_dir, "lineitem"),
        ["l_suppkey"],
        dsum("l_quantity", "total_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q_agg_sum_min_max",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum('l_extendedprice')} AS sum_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_sum_min_max(spark, sf_dir):
    """A3: aggregate(SUM, f).and(MIN, g).and(MAX, h) — the reference's
    entire built-in aggregation enum in one query."""
    return aggregate(
        t(spark, sf_dir, "lineitem"),
        ["l_returnflag"],
        dsum("l_extendedprice", "sum_price"),
        ("min", "l_extendedprice", "min_price"),
        ("max", "l_extendedprice", "max_price"),
    )


@register(
    "q_agg_count_avg",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           {sql_davg('o_totalprice')} AS avg_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_count_avg(spark, sf_dir):
    """A3 extension: COUNT/AVG (user-composed in the reference, first-class
    here)."""
    return aggregate(
        t(spark, sf_dir, "orders"),
        ["o_orderpriority"],
        F.count(F.lit(1)).alias("n_orders"),
        davg("o_totalprice", "avg_price"),
    )


@register(
    "q_agg_global",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           {sql_dsum('l_extendedprice')} AS total_price,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship
    FROM lineitem
    """,
)
def q_agg_global(spark, sf_dir):
    """A4: whole-dataset reduce (AllReduceDriver — parallelism-1 final in
    the reference; Spark computes partials distributed, final is one
    task)."""
    return aggregate(
        t(spark, sf_dir, "lineitem"),
        [],
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice", "total_price"),
        ("min", "l_shipdate", "first_ship"),
        ("max", "l_shipdate", "last_ship"),
    )


@register(
    "q_agg_distinct_count",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_distinct_count(spark, sf_dir):
    """A7 extension: distinct aggregates (absent in the reference). Spark
    plans these as expand + two-phase agg; approx_count_distinct is the
    100TB-preferred variant (exercised in pytest — HLL sketches aren't
    oracle-comparable across engines)."""
    return aggregate(
        t(spark, sf_dir, "lineitem"),
        ["l_returnflag"],
        ("count_distinct", "l_suppkey", "n_suppliers"),
        ("count_distinct", "l_partkey", "n_parts"),
    )


@register(
    "q_agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark, sf_dir):
    """A7 extension: hierarchical subtotals (rollup). NULL marks the
    rolled-up levels in both engines."""
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark, sf_dir):
    """A7 extension: full grouping-set lattice (cube)."""
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"))
    )


@register(
    "q_groupreduce_topk_per_group",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
    FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
               ROW_NUMBER() OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
               ) AS rn
        FROM lineitem
    ) WHERE rn <= 3
    """,
)
def q_groupreduce_topk_per_group(spark, sf_dir):
    """A2/O4: reduceGroup keeping n per group — the reference iterates the
    whole group in a UDF; the engine's window form never materializes
    groups and combines map-side. Tie-broken by the unique line key."""
    return top_k_per_group(
        t(spark, sf_dir, "lineitem").select(
            "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"
        ),
        ["l_suppkey"],
        [F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")],
        3,
    )


@register(
    "q_secondary_sort",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS seq,
           CAST(o_totalprice - LAG(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS DOUBLE) AS price_delta
    FROM orders
    """,
)
def q_secondary_sort(spark, sf_dir):
    """O1: groupBy(k).sortGroup(f) — records reach the group program in
    secondary-key order. Relational form: an ordered window per key; the
    sequence number and consecutive delta prove the intra-group order.
    (The procedural applyInPandas form is exercised in pytest.)"""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders = t(spark, sf_dir, "orders")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.row_number().over(w).alias("seq"),
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).cast("double").alias(
            "price_delta"
        ),
    )


@register(
    "q_accumulator_histogram",
    oracle="""
    SELECT o_orderpriority AS value, COUNT(*) AS count
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_accumulator_histogram(spark, sf_dir):
    """A8: the reference's Histogram accumulator (value→count map merged
    at the JobManager) as its scale-correct distributed form. Scalar
    counters (IntCounter/LongCounter/DoubleCounter) run via df.observe —
    exercised in tests/test_operators.py since observe metrics ride the
    action, not the result set."""
    from incubator_flink_old_spark.functions import histogram

    return histogram(
        t(spark, sf_dir, "orders").select(F.col("o_orderpriority").alias("value")),
        "value",
    )
