"""Relational core t2 queries: sources, row-wise transforms, set ops,
sort/limit, and the reference's flagship TPC-H workloads (SURVEY §2.1,
§2.2, §2.5, §2.6, §2.9 G5).

The reference ships TPCHQuery3 as its canonical relational example
(stratosphere-tests recordJobs/relational/TPCHQuery3.java — SURVEY §5);
q_tpch_q3 is this engine's flagship and ``entry()`` query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_flink_old_spark.operators import (
    distinct,
    except_all,
    filter_,
    flat_map,
    intersect,
    join,
    map_,
    project,
    top_k,
    union_all,
)
from incubator_flink_old_spark.operators.aggregates import global_sort
from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import dsum, davg, sql_davg, sql_dsum, t
from incubator_flink_old_spark.sources import generate_sequence


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q3 (reference recordJobs/relational/TPCHQuery3.java)
# ---------------------------------------------------------------------------

@register(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey, o_orderdate,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark, sf_dir):
    """Shipping-priority query: filter → join ⨝ join → agg → top-k.

    Exercises S4 (parquet source), P3 (pushed filters), J1/J4 (two
    equi-joins; customer side broadcasts at any sane dimension size),
    A1/A3 (map-side-combinable grouped sum) and O4 (TakeOrderedAndProject
    top-k — no global sort materializes). Scale notes: both joins shuffle
    on orderkey/custkey only if Catalyst declines broadcast; the grouped
    sum is decimal-routed for partition-order-independent results.
    """
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = filter_(t(spark, sf_dir, "customer"), F.col("c_mktsegment") == "BUILDING")
    orders = filter_(t(spark, sf_dir, "orders"), F.col("o_orderdate") < cutoff)
    li = filter_(t(spark, sf_dir, "lineitem"), F.col("l_shipdate") > cutoff)
    joined = join(
        li,
        join(orders, cust, on=F.col("o_custkey") == F.col("c_custkey"), hint="broadcast"),
        on=F.col("l_orderkey") == F.col("o_orderkey"),
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )
    return top_k(agg, [F.col("revenue").desc(), F.col("l_orderkey")], 10)


@register(
    "q_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark, sf_dir):
    """Pricing-summary scan-heavy aggregate (8 aggs over 2 group keys).

    The reference had only SUM/MIN/MAX built-ins (SURVEY §2.4 A3) — AVG and
    COUNT were user-composed; here they are first-class. Single scan, fully
    map-side-combinable, whole-stage-codegen'd.
    """
    li = t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc, "sum_disc_price"),
            dsum(disc * (1 + F.col("l_tax")), "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark, sf_dir):
    """Returned-item reporting (reference recordJobs TPCHQuery10 analogue):
    3 joins + grouped sum + top-k, nation broadcast."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )
    return top_k(
        agg.select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name"),
        [F.col("revenue").desc(), F.col("c_custkey")],
        20,
    )


# ---------------------------------------------------------------------------
# Sources (S5) — collection / sequence
# ---------------------------------------------------------------------------

@register(
    "q_source_range",
    oracle="SELECT CAST(range AS BIGINT) AS id, CAST(range AS BIGINT) * 2 AS doubled "
    "FROM range(1, 101)",
)
def q_source_range(spark, sf_dir):
    """S5 generateSequence(1, 100) + a map — distributed number source."""
    return map_(
        generate_sequence(spark, 1, 100),
        F.col("id"),
        (F.col("id") * 2).alias("doubled"),
    )


# ---------------------------------------------------------------------------
# P1–P5 row-wise transforms
# ---------------------------------------------------------------------------

@register(
    "q_map_project_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity * 10.0 AS qty10
    FROM lineitem
    """,
)
def q_map_project_arith(spark, sf_dir):
    """P1 map as Column arithmetic (per-row IEEE ops are deterministic,
    so plain doubles hash-match without the decimal route)."""
    li = t(spark, sf_dir, "lineitem")
    return map_(
        li,
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias(
            "charge"
        ),
        (F.col("l_quantity") * 10.0).alias("qty10"),
    )


@register(
    "q_flatmap_explode",
    oracle="""
    SELECT p_partkey, UNNEST(string_split(p_type, ' ')) AS word
    FROM part
    """,
)
def q_flatmap_explode(spark, sf_dir):
    """P2 flatMap: 1→N via explode (the Collector pattern, relational)."""
    part = t(spark, sf_dir, "part")
    return flat_map(part, F.explode(F.split(F.col("p_type"), " ")), "word", "p_partkey").select(
        "p_partkey", "word"
    )


@register(
    "q_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE (l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0
           AND l_returnflag IN ('A', 'R'))
       OR (l_quantity >= 49.0 AND l_linestatus = 'O')
    """,
)
def q_filter_pred(spark, sf_dir):
    """P3 filter: conjunctive + disjunctive predicate, pushed to the scan."""
    li = t(spark, sf_dir, "lineitem")
    pred = (
        F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24.0)
        & F.col("l_returnflag").isin("A", "R")
    ) | ((F.col("l_quantity") >= 49.0) & (F.col("l_linestatus") == "O"))
    return filter_(li, pred).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "q_project",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
)
def q_project(spark, sf_dir):
    """P4 project: column pruning reaches the parquet scan (ReadSchema)."""
    return project(t(spark, sf_dir, "customer"), "c_custkey", "c_name", "c_mktsegment")


@register(
    "q_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q_distinct(spark, sf_dir):
    """P5 distinct(): dedup via partial-aggregating groupBy underneath."""
    return distinct(t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus"))


# ---------------------------------------------------------------------------
# U1–U2 set operations
# ---------------------------------------------------------------------------

@register(
    "q_union_all",
    oracle="""
    SELECT o_custkey AS custkey, 'order' AS src FROM orders
    UNION ALL
    SELECT c_custkey AS custkey, 'customer' AS src FROM customer
    """,
)
def q_union_all(spark, sf_dir):
    """U1 union: bag semantics (duplicates preserved), no shuffle."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), F.lit("order").alias("src")
    )
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), F.lit("customer").alias("src")
    )
    return union_all(o, c)


@register(
    "q_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    INTERSECT
    SELECT o_custkey FROM orders
    """,
)
def q_intersect(spark, sf_dir):
    """U2 intersect (engine extension; set semantics both engines)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return intersect(c, o)


@register(
    "q_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
    """,
)
def q_except(spark, sf_dir):
    """U2 except (engine extension): big-order customers minus rich ones."""
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000.0)
        .select(F.col("o_custkey").alias("custkey"))
    )
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000.0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return except_all(o, c, keep_duplicates=False)


# ---------------------------------------------------------------------------
# O2/O4 sort & limit
# ---------------------------------------------------------------------------

@register(
    "q_sink_global_sort",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def q_sink_global_sort(spark, sf_dir):
    """O2/S12 global order: range-partition + local sort (total order
    across output partitions — the reference's setGlobalOrder sink)."""
    return global_sort(
        t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderdate"),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey"),
    )


@register(
    "q_topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 15
    """,
)
def q_topk_global(spark, sf_dir):
    """O4 top-k: TakeOrderedAndProject (per-partition heaps, driver merge;
    no full sort). Tie-broken by the (l_orderkey, l_linenumber) key."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
    return top_k(
        li,
        [F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")],
        15,
    )


@register(
    "q_map_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net
    FROM lineitem WHERE l_quantity > 40.0
    """,
)
def q_map_pandas(spark, sf_dir):
    """P1 opaque-code form: the same row transform as a rich pandas map
    (open/close lifecycle over Arrow batches). Per-row float64 arithmetic
    is order-independent, so even the Python path hash-matches the SQL
    oracle — proving the Arrow map path, not just the Column path."""
    from incubator_flink_old_spark.functions import RichMapFunction, apply_rich

    class Net(RichMapFunction):
        def open(self, config):
            self.rate = config["rate"]

        def map(self, batch):
            out = batch[["l_orderkey", "l_linenumber"]].copy()
            out["net"] = batch["l_extendedprice"] * (self.rate - batch["l_discount"])
            return out

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 40.0).select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    return apply_rich(
        li, Net(), "l_orderkey long, l_linenumber int, net double", config={"rate": 1.0}
    )


@register(
    "q_tpch_q14",
    oracle=f"""
    SELECT 100.00 * {sql_dsum("CASE WHEN p_type LIKE 'PROMO%' "
                              "THEN l_extendedprice * (1 - l_discount) END")}
             / {sql_dsum('l_extendedprice * (1 - l_discount)')} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promotion effect): conditional aggregation over a
    fact-dim join — part broadcasts, one scan of the date-pruned fact."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), net)
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(promo.cast("decimal(27,6)")).cast("double")
            / F.sum(net.cast("decimal(27,6)")).cast("double")
        ).alias("promo_revenue")
    )


@register(
    "q_tpch_q18",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           {sql_dsum('l_quantity')} AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 250.0
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): semi join against a grouped
    HAVING subquery, then re-aggregate — both aggregations share the
    l_orderkey shuffle (exchange reuse)."""
    li = t(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250.0)
        .select("l_orderkey")
    )
    joined = (
        li.join(big_orders, on="l_orderkey", how="left_semi")
        .join(t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
    )
    agg = joined.groupBy(
        "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice"
    ).agg(dsum("l_quantity", "total_qty"))
    return top_k(agg, [F.col("o_totalprice").desc(), F.col("o_orderkey")], 100)
