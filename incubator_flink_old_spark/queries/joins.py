"""Join-family t2 queries (SURVEY §2.3 J1–J8 + §2.9 G5 WebLogAnalysis).

The reference's only native join is the inner equi-join ("Match",
JoinOperator → MatchDriver); outer/semi/anti were coGroup idioms and are
first-class here. Physical strategy is Catalyst/AQE's call; the broadcast
hint mirrors the reference's joinWithTiny.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_flink_old_spark.operators import cross, join
from incubator_flink_old_spark.operators.joins import co_group_relational
from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import dsum, sql_dsum, t


@register(
    "q_join_inner",
    oracle="""
    SELECT o_orderkey, o_orderdate, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS net
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F' AND l_quantity > 45.0
    """,
)
def q_join_inner(spark, sf_dir):
    """J1: equi inner join with per-pair projection (the Match UDF shape).

    Fact-to-fact join: shuffles both sides on orderkey unless AQE turns
    the filtered orders side into a broadcast at runtime — exactly the
    adaptivity the reference's static JoinHints lacked.
    """
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45.0)
    return join(orders, li, on=F.col("o_orderkey") == F.col("l_orderkey")).select(
        "o_orderkey",
        "o_orderdate",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
    )


@register(
    "q_join_broadcast",
    oracle="""
    SELECT s_suppkey, s_name, n_name, r_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('AMERICA', 'ASIA')
    """,
)
def q_join_broadcast(spark, sf_dir):
    """J4: joinWithTiny → BROADCAST_HASH. Both dims broadcast; zero
    shuffle of the probe side — the 100TB-correct shape for star joins."""
    sup = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name").isin("AMERICA", "ASIA"))
    return (
        join(sup, nation, on=F.col("s_nationkey") == F.col("n_nationkey"), hint="broadcast")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name", "r_name")
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0
    )
    """,
)
def q_join_semi(spark, sf_dir):
    """J7 semi join (reference idiom: coGroup emitting left iff right
    non-empty; engine: first-class left_semi — no duplication, no
    materialized right side)."""
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return join(
        cust, big, on=cust["c_custkey"] == big["o_custkey"], how="left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0
    )
    """,
)
def q_join_anti(spark, sf_dir):
    """J7 anti join (reference idiom: coGroup emitting left iff right
    empty). NULL-key semantics match NOT IN here because o_custkey is
    non-null."""
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return join(
        cust, big, on=cust["c_custkey"] == big["o_custkey"], how="left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM (SELECT * FROM customer WHERE c_acctbal < 0.0) c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
      ON c.c_custkey = o.o_custkey
    """,
)
def q_join_left_outer(spark, sf_dir):
    """J8 left outer (reference idiom: coGroup with empty-right handling).
    Unmatched customers surface with NULL order columns."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0.0)
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return join(
        cust, orders, on=cust["c_custkey"] == orders["o_custkey"], how="left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "q_cogroup_outer",
    oracle=f"""
    SELECT k.custkey,
           l.n_small_orders,
           l.small_total,
           r.n_big_orders,
           r.big_total
    FROM (
        SELECT DISTINCT o_custkey AS custkey FROM orders
    ) k
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n_small_orders,
               {sql_dsum('o_totalprice')} AS small_total
        FROM orders WHERE o_totalprice <= 100000.0 GROUP BY o_custkey
    ) l ON k.custkey = l.o_custkey
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n_big_orders,
               {sql_dsum('o_totalprice')} AS big_total
        FROM orders WHERE o_totalprice > 100000.0 GROUP BY o_custkey
    ) r ON k.custkey = r.o_custkey
    """,
)
def q_cogroup_outer(spark, sf_dir):
    """J5 coGroup, relational form (SURVEY §7.3 hard part 2).

    Two keyed streams (small vs big orders per customer) delivered
    together per key, INCLUDING keys present on only one side — the
    full-outer pre-aggregate shape. The engine's exact pandas coGroup is
    exercised in pytest; this SQL-expressible form is what a 100TB plan
    should use when the group program is aggregable.
    """
    orders = t(spark, sf_dir, "orders")
    small = orders.filter(F.col("o_totalprice") <= 100000.0)
    big = orders.filter(F.col("o_totalprice") > 100000.0)
    cg = co_group_relational(
        small,
        big,
        ["o_custkey"],
        ["o_custkey"],
        [F.count(F.lit(1)).alias("n_small_orders"), dsum("o_totalprice", "small_total")],
        [F.count(F.lit(1)).alias("n_big_orders"), dsum("o_totalprice", "big_total")],
    )
    return cg.select(
        F.col("o_custkey").alias("custkey"),
        "n_small_orders",
        "small_total",
        "n_big_orders",
        "big_total",
    )


@register(
    "q_cross_theta",
    oracle="""
    SELECT a.n_nationkey AS n1, b.n_nationkey AS n2, a.n_regionkey AS regionkey
    FROM nation a, nation b
    WHERE a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def q_cross_theta(spark, sf_dir):
    """J6 cross + filter = theta join (the reference's only non-equi path,
    CrossDriver block-nested-loop). Catalyst pushes the predicate into a
    BroadcastNestedLoopJoin; never run unpruned at scale."""
    a = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1"), F.col("n_regionkey").alias("rk1")
    )
    b = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2"), F.col("n_regionkey").alias("rk2")
    )
    return cross(a, b, (F.col("rk1") == F.col("rk2")) & (F.col("n1") < F.col("n2"))).select(
        "n1", "n2", F.col("rk1").alias("regionkey")
    )


@register(
    "q_weblog_antijoin",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE c.c_acctbal > 8000.0
      AND o.o_orderpriority = '1-URGENT'
      AND o.o_orderkey NOT IN (
          SELECT l_orderkey FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    """,
)
def q_weblog_antijoin(spark, sf_dir):
    """G5 WebLogAnalysis shape (recordJobTests/WebLogAnalysisITCase):
    filter ⋈ filter, then anti-join on a date-filtered fact — mapped onto
    the star schema (docs→customer, ranks→orders, visits→lineitem)."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 8000.0)
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    recent = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    joined = join(cust, orders, on=F.col("c_custkey") == F.col("o_custkey"))
    return join(
        joined, recent, on=F.col("o_orderkey") == F.col("l_orderkey"), how="left_anti"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "q_cogroup_pandas",
    oracle=f"""
    SELECT k.custkey,
           COALESCE(l.n_small, 0) AS n_small,
           COALESCE(r.n_big, 0) AS n_big,
           COALESCE(l.small_total, 0.0) + COALESCE(r.big_total, 0.0) AS total
    FROM (
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_custkey % 7 = 0
    ) k
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n_small,
               {sql_dsum('o_totalprice')} AS small_total
        FROM orders WHERE o_totalprice <= 100000.0 AND o_custkey % 7 = 0
        GROUP BY o_custkey
    ) l ON k.custkey = l.o_custkey
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n_big,
               {sql_dsum('o_totalprice')} AS big_total
        FROM orders WHERE o_totalprice > 100000.0 AND o_custkey % 7 = 0
        GROUP BY o_custkey
    ) r ON k.custkey = r.o_custkey
    """,
)
def q_cogroup_pandas(spark, sf_dir):
    """J5 exact form: cogrouped applyInPandas — both key-groups delivered
    to Python together (empty side included), counts/sums computed in
    pandas with the same decimal(…,6) quantization as the engine's dsum,
    so the result hash-matches the relational oracle bit-exactly. Proves
    the Arrow cogroup path end-to-end; for aggregable group programs at
    scale prefer co_group_relational (stays JVM-side)."""
    import decimal

    from incubator_flink_old_spark.operators.joins import co_group

    # deterministic key subset: the exact-J5 demo need not pay full-corpus
    # Arrow cost in the bench (prod group programs use co_group_relational)
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 7 == 0)
    small = orders.filter(F.col("o_totalprice") <= 100000.0).select(
        "o_custkey", "o_totalprice"
    )
    big = orders.filter(F.col("o_totalprice") > 100000.0).select(
        "o_custkey", "o_totalprice"
    )

    def fn(key, lpdf, rpdf):
        import pandas as pd

        def dec_sum(series):
            # repr(float) = shortest round-trip decimal — the SAME string
            # Spark's double→decimal cast (Double.toString) and the
            # oracle's VARCHAR-routed cast round; HALF_UP on that string.
            total = sum(
                (
                    decimal.Decimal(repr(float(v))).quantize(
                        decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
                    )
                    for v in series
                ),
                decimal.Decimal(0),
            )
            return float(total)

        return pd.DataFrame(
            {
                "custkey": [key[0]],
                "n_small": [len(lpdf)],
                "n_big": [len(rpdf)],
                "total": [dec_sum(lpdf["o_totalprice"]) + dec_sum(rpdf["o_totalprice"])],
            }
        )

    return co_group(
        small,
        big,
        ["o_custkey"],
        ["o_custkey"],
        fn,
        "custkey long, n_small long, n_big long, total double",
    )
