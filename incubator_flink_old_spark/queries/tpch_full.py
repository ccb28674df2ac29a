"""TPC-H completion — the 15 queries beyond Q1/Q3/Q5/Q6/Q10/Q14/Q18
(SURVEY §2.9 G5: the reference ships TPC-H example jobs and its
relational operator set is exercised by the full suite; a user of a
TPC-H-capable engine expects all 22).

The synthetic star schema is a TPC-H SUBSET (no partsupp table; no
l_shipmode/commitdate/receiptdate, c_phone/address, p_container,
o_comment...), so each query is ADAPTED: the join/aggregate/subquery
SHAPE — the part that exercises the engine — is preserved exactly, and
missing columns are replaced by documented stand-ins:

- partsupp            → the distinct (l_partkey, l_suppkey) relation with
                        MIN(l_extendedprice/l_quantity) as supplycost
- "late" commit dates → l_shipdate > o_orderdate + 60 days
- l_shipmode          → l_returnflag classes
- ps_supplycost in Q9 → p_retailprice * l_quantity as the cost term
- c_phone country     → c_nationkey
- "no orders ever"    → no orders since 1999-01-01 (every synthetic
                        customer has old orders)

Money aggregates route through dsum/davg (bit-stable decimal sums —
queries/_util.py); quantity sums are integral doubles (exact in IEEE at
any order, verified on the fixture); MIN/MAX and integer counts are
order-independent by nature. Scalar thresholds (0.2*avg, max(revenue))
are computed from those exact aggregates with identical expression
shape on both engines, so comparisons and equality joins see identical
doubles.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import dsum, davg, sql_davg, sql_dsum, t


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier (partsupp stood in by the lineitem relation)
# --------------------------------------------------------------------------
_SUPPLY_SQL = """
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS supplycost
        FROM lineitem GROUP BY l_partkey, l_suppkey
"""


@register(
    "q_tpch_q2",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL}),
    eligible AS (
        SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_acctbal, s.s_name,
               n.n_name, supply.supplycost
        FROM part p
        JOIN supply ON p.p_partkey = supply.l_partkey
        JOIN supplier s ON supply.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE p.p_size = 15 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
    ),
    mins AS (
        SELECT p_partkey AS mk, MIN(supplycost) AS mincost
        FROM eligible GROUP BY p_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supplycost
    FROM eligible JOIN mins
      ON p_partkey = mk AND supplycost = mincost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 (min-cost supplier). partsupp is stood in by the distinct
    (partkey, suppkey) pairs observed in lineitem with min unit price as
    supply cost. Shape preserved: dim-filtered join tree + per-part MIN
    + equality join back (the correlated-subquery plan). The min-cost
    equality joins exact doubles (MIN of identical divisions)."""
    li = t(spark, sf_dir, "lineitem")
    supply = li.groupBy(
        F.col("l_partkey"), F.col("l_suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost"))
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    sup = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        supply.join(F.broadcast(part), supply["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(sup), supply["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("p_partkey", "p_brand", "s_suppkey", "s_acctbal", "s_name", "n_name", "supplycost")
    )
    mins = eligible.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("supplycost").alias("mincost")
    )
    return (
        eligible.join(
            mins,
            (eligible["p_partkey"] == mins["mk"])
            & (eligible["supplycost"] == mins["mincost"]),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "s_suppkey"
        )
        .limit(100)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supplycost")
    )


# --------------------------------------------------------------------------
# Q4 — order priority checking (late = shipped >60 days after order)
# --------------------------------------------------------------------------
@register(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 (order priority checking): quarter window + correlated
    EXISTS → left-semi join (the commitdate<receiptdate lateness test is
    stood in by shipped-more-than-60-days-late)."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-10-01 00:00:00"))
    )
    li = t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# --------------------------------------------------------------------------
@register(
    "q_tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum("volume")} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(YEAR FROM l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 (volume shipping): the two-nation-pair OR predicate over a
    5-way join, revenue by (supp_nation, cust_nation, ship year)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    sup = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("volume", "revenue"))
    )


# --------------------------------------------------------------------------
# Q8 — national market share
# --------------------------------------------------------------------------
@register(
    "q_tpch_q8",
    oracle=f"""
    SELECT o_year,
           ROUND({sql_dsum("nation_volume")} / {sql_dsum("volume")}, 6)
               AS mkt_share
    FROM (
        SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               CASE WHEN n2.n_name = 'NATION_3'
                    THEN l_extendedprice * (1 - l_discount)
                    ELSE 0.0 END AS nation_volume
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY o_year
    """,
)
def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 (national market share): NATION_3's share of ECONOMY-part
    revenue sold into AMERICA, by order year. The share division runs on
    two exact decimal-routed sums → identical doubles both engines;
    rounded to 6dp on both sides."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    cust = t(spark, sf_dir, "customer")
    sup = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_regionkey").alias("rk1")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation")
    )
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("nk1"))
        .join(F.broadcast(region), F.col("rk1") == F.col("r_regionkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("nk2"))
    )
    vols = joined.select(
        F.year("o_orderdate").alias("o_year"),
        vol.alias("volume"),
        F.when(F.col("supp_nation") == "NATION_3", vol)
        .otherwise(F.lit(0.0))
        .alias("nation_volume"),
    )
    return vols.groupBy("o_year").agg(
        F.round(
            F.sum(F.col("nation_volume").cast("decimal(27,6)")).cast("double")
            / F.sum(F.col("volume").cast("decimal(27,6)")).cast("double"),
            6,
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit (cost term stood in by retail price)
# --------------------------------------------------------------------------
@register(
    "q_tpch_q9",
    oracle=f"""
    SELECT nation, o_year, {sql_dsum("amount")} AS sum_profit
    FROM (
        SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - p_retailprice * l_quantity AS amount
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%')
    GROUP BY nation, o_year
    """,
)
def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 (product-type profit): profit per supplier nation per
    year for parts matching a name pattern; ps_supplycost is stood in by
    p_retailprice so the amount keeps its revenue-minus-cost shape."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    sup = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    nation = t(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount", "sum_profit"))
    )


# --------------------------------------------------------------------------
# Q11 — important stock identification
# --------------------------------------------------------------------------
@register(
    "q_tpch_q11",
    oracle=f"""
    WITH pv AS (
        SELECT l_partkey AS partkey,
               {sql_dsum("l_extendedprice * l_quantity")} AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_2'
        GROUP BY l_partkey),
    tot AS (SELECT {sql_dsum("l_extendedprice * l_quantity")} AS total
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_2')
    SELECT partkey, value
    FROM pv CROSS JOIN tot
    WHERE value > total * 0.001
    """,
)
def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 (important stock): per-part inventory value for one
    nation's suppliers vs a global-threshold scalar subquery (HAVING >
    fraction of total). partsupp value is stood in by lineitem
    extendedprice×quantity. The threshold compares two exact
    decimal-routed sums — identical doubles on both engines."""
    li = t(spark, sf_dir, "lineitem")
    sup = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    base = li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")).join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    val = F.col("l_extendedprice") * F.col("l_quantity")
    pv = base.groupBy(F.col("l_partkey").alias("partkey")).agg(dsum(val, "value"))
    tot = base.agg(dsum(val, "total"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("value") > F.col("total") * 0.001)
        .select("partkey", "value")
    )


# --------------------------------------------------------------------------
# Q12 — shipping-class priority counts (shipmode stood in by returnflag)
# --------------------------------------------------------------------------
@register(
    "q_tpch_q12",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_linestatus = 'F'
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 (shipping modes / priority): conditional counts per
    class — l_shipmode is stood in by l_returnflag."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_linestatus") == "F")
        & (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution
# --------------------------------------------------------------------------
@register(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer distribution): left join with a join-time
    filter (the o_comment NOT LIKE stand-in is a priority exclusion),
    double aggregation — histogram of order counts."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    per_cust = cust.join(
        orders,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderpriority") != "5-LOW"),
        "left",
    ).groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# Q15 — top supplier by quarterly revenue
# --------------------------------------------------------------------------
@register(
    "q_tpch_q15",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               {sql_dsum("l_extendedprice * (1 - l_discount)")} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier): revenue view over one quarter + scalar
    MAX subquery equality (exact decimal-routed revenue → the equality
    join on doubles is engine-portable)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    sup = t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q16 — part/supplier relationship counts
# --------------------------------------------------------------------------
@register(
    "q_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 (part/supplier relation): distinct supplier counts per
    (brand, type, size) with NOT-IN supplier exclusion (negative balance
    stands in for the complaints comment filter); partsupp stood in by
    lineitem pairs."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 23)
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue
# --------------------------------------------------------------------------
@register(
    "q_tpch_q17",
    oracle=f"""
    WITH pavg AS (
        SELECT l_partkey AS ak, 0.2 * ({sql_davg("l_quantity")}) AS threshold
        FROM lineitem GROUP BY l_partkey)
    SELECT ROUND({sql_dsum("l_extendedprice")} / 7.0, 6) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pavg ON l_partkey = ak
    WHERE p_brand = 'Brand#3' AND p_size = 10
      AND l_quantity < threshold
    """,
)
def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity orders): correlated per-part AVG
    threshold → group-agg + join; p_container stood in by p_size. The
    threshold is 0.2×exact-decimal mean — identical both engines, so the
    strict < comparison is portable."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") == 10)
    )
    pavg = (
        li.groupBy(F.col("l_partkey").alias("ak"))
        .agg(davg("l_quantity", "mean_q"))
        .select("ak", (F.lit(0.2) * F.col("mean_q")).alias("threshold"))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(pavg, F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).cast("double")
                / F.lit(7.0),
                6,
            ).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# Q19 — discounted revenue over an OR-of-ANDs predicate
# --------------------------------------------------------------------------
@register(
    "q_tpch_q19",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 (discounted revenue): the classic OR-of-AND-clauses
    predicate spanning both join sides — Catalyst must still push the
    part-only conjuncts to the dim scan."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    pred = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(pred)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q20 — suppliers with excess shipments
# --------------------------------------------------------------------------
@register(
    "q_tpch_q20",
    oracle="""
    WITH part_tot AS (
        SELECT l_partkey AS tk, SUM(l_quantity) AS tot_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_partkey),
    heavy AS (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_name LIKE 'small%'
        JOIN part_tot ON l_partkey = tk
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey, tot_qty
        HAVING SUM(l_quantity) > 0.3 * tot_qty)
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_4'
      AND s_suppkey IN (SELECT l_suppkey FROM heavy)
    """,
)
def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 (excess inventory): nested aggregate comparison — a
    supplier qualifies if, for some 'small%' part, it shipped >30% of
    that part's total year volume (availqty>½×shipped stood in). Integral
    quantity sums are exact in IEEE at any order, so the HAVING compare
    is portable; final semi join + nation filter."""
    year = (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00")) & (
        F.col("l_shipdate") < _ts("1998-01-01 00:00:00")
    )
    li = t(spark, sf_dir, "lineitem").filter(year)
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    part_tot = li.groupBy(F.col("l_partkey").alias("tk")).agg(
        F.sum("l_quantity").alias("tot_qty")
    )
    heavy = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(part_tot, F.col("l_partkey") == F.col("tk"))
        .groupBy("l_suppkey", "l_partkey", "tot_qty")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 0.3 * F.col("tot_qty"))
        .select("l_suppkey")
    )
    sup = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    return (
        sup.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting
# --------------------------------------------------------------------------
@register(
    "q_tpch_q21",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND n_name = 'NATION_0'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 (waiting suppliers): the double-correlated EXISTS /
    NOT-EXISTS — sole 'R'-flag supplier on multi-supplier finished
    orders (late-delivery stood in by the R return flag). Spark plans
    the pair as a semi + anti join on orderkey."""
    li = t(spark, sf_dir, "lineitem")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("lo"), F.col("l_suppkey").alias("ls")
        )
    )
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    other = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    other_r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    sup = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    base = (
        l1.join(orders, F.col("lo") == F.col("o_orderkey"))
        .join(
            other,
            (F.col("o2") == F.col("lo")) & (F.col("s2") != F.col("ls")),
            "left_semi",
        )
        .join(
            other_r,
            (F.col("o3") == F.col("lo")) & (F.col("s3") != F.col("ls")),
            "left_anti",
        )
    )
    return (
        base.join(F.broadcast(sup), F.col("ls") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --------------------------------------------------------------------------
# Q22 — global sales opportunity
# --------------------------------------------------------------------------
@register(
    "q_tpch_q22",
    oracle=f"""
    WITH thresh AS (
        SELECT {sql_davg("c_acctbal")} AS avg_bal
        FROM customer
        WHERE c_acctbal > 0.0 AND c_nationkey IN (3, 8, 13, 18, 23)),
    eligible AS (
        SELECT c_custkey, c_nationkey AS cntrycode, c_acctbal
        FROM customer CROSS JOIN thresh
        WHERE c_nationkey IN (3, 8, 13, 18, 23)
          AND c_acctbal > avg_bal
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'))
    SELECT cntrycode, COUNT(*) AS numcust,
           {sql_dsum("c_acctbal")} AS totacctbal
    FROM eligible
    GROUP BY cntrycode
    """,
)
def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers in selected countries with no RECENT orders (every
    synthetic customer has old orders, so 'never ordered' is stood in by
    'no orders since 1999'); country code stood in by c_nationkey.
    Scalar-avg subquery → broadcast; NOT EXISTS → anti join."""
    cust = t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(3, 8, 13, 18, 23)
    )
    thresh = cust.filter(F.col("c_acctbal") > 0.0).agg(davg("c_acctbal", "avg_bal"))
    recent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("1999-01-01 00:00:00"))
        .select("o_custkey")
    )
    eligible = (
        cust.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        eligible.select(F.col("c_nationkey").alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )
