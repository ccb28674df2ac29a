"""Second extension batch: grouping sets, unpivot/melt, regex functions,
array-valued aggregates, SQL-entry-point subqueries, and window frame
variants — rounding out the relational surface a reference user expects
from a full engine.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import sql_dsum, t
from incubator_flink_old_spark.sources import load_table


@register(
    "q_agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_agg_grouping_sets(spark, sf_dir):
    """A7 extension: explicit grouping sets via the SQL entry point (the
    engine's second query surface; Catalyst plans one Expand + one agg)."""
    # engine-prefixed view name: never clobber views the host session
    # (the driver's!) may have registered under the canonical table names
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("__ifos_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
        FROM __ifos_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS value FROM supplier
    UNION ALL
    SELECT s_suppkey, 'nationkey' AS metric, CAST(s_nationkey AS DOUBLE) AS value
    FROM supplier
    """,
)
def q_unpivot(spark, sf_dir):
    """Unpivot/melt (engine extension): wide → long. Spark's native
    unpivot; the oracle is the equivalent UNION ALL expansion."""
    sup = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal", F.col("s_nationkey").cast("double").alias("s_nationkey")
    )
    return sup.unpivot(
        "s_suppkey",
        ["s_acctbal", "s_nationkey"],
        "metric",
        "value",
    ).select(
        "s_suppkey",
        F.when(F.col("metric") == "s_acctbal", "acctbal")
        .otherwise("nationkey")
        .alias("metric"),
        "value",
    )


@register(
    "q_fn_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           len(regexp_extract_all(p_name, '[0-9]+')) AS n_numbers,
           regexp_matches(p_type, '^STANDARD') AS is_standard
    FROM part
    """,
)
def q_fn_regex(spark, sf_dir):
    """Regex function family (portable subset of Java/RE2 syntax)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.size(F.expr("regexp_extract_all(p_name, '[0-9]+', 0)")).cast("long").alias(
            "n_numbers"
        ),
        F.col("p_type").rlike("^STANDARD").alias("is_standard"),
    )


@register(
    "q_agg_collect",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), '|') AS nations,
           len(list(n_name)) AS n
    FROM nation GROUP BY n_regionkey
    """,
)
def q_agg_collect(spark, sf_dir):
    """Array-valued aggregation: collect_list sorted for determinism
    (collection order is partition-dependent; sort_array pins it — the
    engine's rule for any array-typed agg output). The array is emitted
    as a '|'-joined string: the driver's pandas canonicalizer cannot
    sort/hash ndarray cells (CORRECTNESS_r02 err), and a delimited
    scalar exercises the identical collect+sort work with a hashable
    result."""
    return (
        t(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q_subquery_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0
    )
      AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
)
def q_subquery_exists(spark, sf_dir):
    """Correlated EXISTS + scalar subquery through the SQL entry point
    (Catalyst rewrites EXISTS to a semi join, the scalar to a broadcast)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("__ifos_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__ifos_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM __ifos_customer c
        WHERE EXISTS (
            SELECT 1 FROM __ifos_orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0
        )
          AND c_acctbal > (SELECT AVG(c_acctbal) FROM __ifos_customer)
        """
    )


@register(
    "q_window_frames",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS moving3,
           FIRST_VALUE(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS first_val,
           MAX(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS peak
    FROM events
    """,
)
def q_window_frames(spark, sf_dir):
    """W6 frame variants: bounded moving window, first_value, whole-
    partition frame."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast("decimal(27,6)"))
        .over(w.rowsBetween(-2, Window.currentRow))
        .cast("double")
        .alias("moving3"),
        F.first("value").over(w).alias("first_val"),
        F.max("value")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("peak"),
    )


@register(
    "q_window_ntile",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           NTILE(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
           ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice DESC, o_orderkey), 9)
               AS pct_rank,
           ROUND(CUME_DIST() OVER (ORDER BY o_totalprice DESC, o_orderkey), 9)
               AS cume
    FROM orders
    """,
)
def q_window_ntile(spark, sf_dir):
    """W6 distribution analytics: ntile / percent_rank / cume_dist over a
    fully tie-broken global order — computed on the DISTRIBUTED rank
    primitive (range-partition + offsets, aggregates.global_row_number)
    rather than an empty-partitionBy window that funnels every row
    through one task. With a unique total order the closed forms are
    exact: ntile's first (total mod n) buckets take ceil(total/n) rows;
    percent_rank = (rn-1)/(total-1); cume_dist = rn/total.
    """
    from incubator_flink_old_spark.operators.aggregates import global_row_number

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = global_row_number(
        o, [F.col("o_totalprice").desc(), F.col("o_orderkey")], alias="rn"
    )
    total = ranked.count()  # scalar; the rank pass already materialized
    n = 4
    q, r = divmod(total, n)
    big = (q + 1) * r  # rows living in the first r (larger) buckets
    rn = F.col("rn")
    quartile = F.when(rn <= big, F.ceil(rn / (q + 1))).otherwise(
        r + F.ceil((rn - big) / q) if q else F.lit(r)
    )
    # total==1: (rn-1)/(total-1) is 0/0 → NULL under Spark's non-ANSI
    # division, but PERCENT_RANK is defined as 0 on a single row.
    pct = (
        F.round((rn - 1) / F.lit(float(total - 1)), 9)
        if total > 1
        else F.lit(0.0)
    )
    return ranked.select(
        "o_orderkey",
        "o_totalprice",
        quartile.cast("int").alias("quartile"),
        pct.alias("pct_rank"),
        F.round(rn / F.lit(float(max(total, 1))), 9).alias("cume"),
    )
