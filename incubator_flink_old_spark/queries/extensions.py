"""Round-1 extension queries: more canonical TPC-H workloads, time-series
joins (as-of / range — absent in both the reference and core Spark,
composed from windows/equi-joins), pivot, exact percentiles, and
deterministic hash sampling.

These extend SURVEY §2's inventory along the axes a reference user would
hit first when the engine replaces their stack.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import dsum, sql_dsum, t


@register(
    "q_tpch_q5",
    oracle=f"""
    SELECT n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): 5 joins over the full star —
    the widest join tree in the suite; dims broadcast, facts shuffle on
    orderkey once."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    sup = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(sup),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q_tpch_q6",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
)
def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 (forecast revenue change): the pure scan-filter-agg probe
    — every predicate must reach the parquet scan."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_asof_join",
    oracle="""
    WITH tagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'click' THEN event_id END AS click_id,
               CASE WHEN event_type = 'click' THEN ts END AS click_ts,
               event_type
        FROM events WHERE event_type IN ('click', 'purchase')
    ), filled AS (
        SELECT user_id, ts, event_id, event_type,
               LAST_VALUE(click_id IGNORE NULLS) OVER w AS last_click_id,
               LAST_VALUE(click_ts IGNORE NULLS) OVER w AS last_click_ts
        FROM tagged
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        )
    )
    SELECT event_id, user_id, ts, last_click_id, last_click_ts
    FROM filled WHERE event_type = 'purchase'
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of join (engine extension; native in neither the reference nor
    Spark): for each purchase, the latest strictly-earlier click of the
    same user.

    Implementation: union-tag + last_value(ignore nulls) over a
    (ts, event_id)-ordered window ending 1 PRECEDING — one shuffle on
    user_id, no range explosion; the classic scalable as-of shape
    (pd.merge_asof per group would ship data to Python for nothing).
    """
    ev = t(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "purchase"))
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("click_id"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    filled = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last("click_id", ignorenulls=True).over(w).alias("last_click_id"),
        F.last("click_ts", ignorenulls=True).over(w).alias("last_click_ts"),
    )
    return filled.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "last_click_id", "last_click_ts"
    )


@register(
    "q_range_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           COUNT(v.event_id) AS n_views_10m,
           COALESCE(CAST(SUM(CAST(v.value AS DECIMAL(27,6))) AS DOUBLE), 0.0)
               AS view_value_10m
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts >= p.ts - INTERVAL '10 minutes' AND v.ts < p.ts
    GROUP BY p.event_id, p.user_id, p.ts
    """,
)
def q_range_join(spark, sf_dir):
    """Range (interval) join: per purchase, activity in the trailing 10
    minutes. Equi-join on user_id carries the shuffle; the time band is a
    post-join filter. At 100TB add a coarse time-bucket equi-key to both
    sides to keep per-task pair counts bounded."""
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("v_id"),
        F.col("value").alias("v_value"),
    )
    joined = p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("ts") - F.expr("INTERVAL 10 minutes"))
        & (F.col("v_ts") < F.col("ts")),
        "left",
    )
    return joined.groupBy("event_id", "user_id", "ts").agg(
        F.count("v_id").alias("n_views_10m"),
        F.coalesce(
            F.sum(F.col("v_value").cast("decimal(27,6)")).cast("double"), F.lit(0.0)
        ).alias("view_value_10m"),
    )


@register(
    "q_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark, sf_dir):
    """Pivot (engine extension): linestatus columns out of rows. Explicit
    pivot values keep the plan single-pass (no value-discovery job)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double"))
    )


@register(
    "q_agg_percentile",
    oracle="""
    SELECT o_orderpriority,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 6)
               AS median_price,
           ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 6)
               AS p90_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_percentile(spark, sf_dir):
    """Exact interpolated percentiles per group (both engines use the
    same linear interpolation; rounded 6dp for float tolerance). At scale
    prefer approx_percentile — sketch-mergeable, no global sort."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("median_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90_price"),
        )
    )


@register(
    "q_sample_hash",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 10 = 0
    """,
)
def q_sample_hash(spark, sf_dir):
    """Deterministic ~10% hash sample (engine extension): portable
    md5-keyed Bernoulli — reproducible across engines/runs/partitionings,
    unlike rand()-based sampling."""
    o = t(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.encode(F.col("o_orderkey").cast("string"), "UTF-8")), 1, 15),
        16,
        10,
    ).cast("long")
    return o.filter(h % 10 == 0).select("o_orderkey", "o_totalprice")


@register(
    "q_explode_pos",
    oracle="""
    SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
           CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS val
    FROM embeddings, generate_series(1, 3) t(i)
    """,
)
def q_explode_pos(spark, sf_dir):
    """posexplode over the leading embedding dims (P2 variant with
    positions — the reference's Collector index idiom)."""
    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 3)).alias("pos", "v")
    ).select("vec_id", "pos", F.col("v").cast("double").alias("val"))
