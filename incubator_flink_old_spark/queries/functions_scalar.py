"""Scalar-function t2 queries (SURVEY §2.8).

The reference has NO scalar function library — every string/date/math/
array/json manipulation was user Java inside a rich function. The engine's
scalar library is Spark's built-in Column expressions (JVM-side,
whole-stage-codegen'd); these queries pin down the surface and its
cross-engine determinism.

Determinism notes: only exactly-rounded IEEE ops (+,-,*,/,sqrt,abs) and
integer-structured functions are used so DuckDB oracles match bitwise;
transcendentals (pow/ln/exp) are engine-libm-dependent and deliberately
excluded from oracle queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import t


@register(
    "q_fn_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           LENGTH(c_name) AS name_len,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CONCAT(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS seg_key,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           (c_name LIKE '%00%') AS has_00
    FROM customer
    """,
)
def q_fn_string(spark, sf_dir):
    """String library: upper/lower/length/substring/concat/replace/like."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("#", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.col("c_name").like("%00%").alias("has_00"),
    )


@register(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
           CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
           CAST(DAY(o_orderdate) AS INTEGER) AS order_day,
           CAST(QUARTER(o_orderdate) AS INTEGER) AS order_quarter,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS INTEGER) AS days_since_epoch_start
    FROM orders
    """,
)
def q_fn_date(spark, sf_dir):
    """Date/time library: year/month/day/quarter/date_trunc/datediff."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp")
        ).alias("days_since_epoch_start"),
    )


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS disc_dev,
           ROUND(l_extendedprice / 100.0, 1) AS price_h,
           CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS qty_ceil7,
           CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
           SQRT(l_extendedprice) AS price_sqrt,
           CAST(l_orderkey % 97 AS BIGINT) AS key_mod
    FROM lineitem
    """,
)
def q_fn_math(spark, sf_dir):
    """Math library: abs/round/ceil/floor/sqrt/modulo — exactly-rounded
    IEEE ops only (cross-engine bit-stable)."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.col("l_extendedprice") / 100.0, 1).alias("price_h"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_ceil7"),
        F.floor(F.col("l_extendedprice") / 1000.0).alias("price_k"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_orderkey") % 97).alias("key_mod"),
    )


@register(
    "q_fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000.0 THEN 'large'
                WHEN o_totalprice > 100000.0 THEN 'medium'
                ELSE 'small' END AS size_class,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_norm,
           GREATEST(o_totalprice, 150000.0) AS price_floor,
           LEAST(o_totalprice, 400000.0) AS price_cap,
           (CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS is_urgent
    FROM orders
    """,
)
def q_fn_conditional(spark, sf_dir):
    """Conditional library: CASE WHEN / coalesce / nullif / greatest /
    least."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000.0, "large")
        .when(F.col("o_totalprice") > 100000.0, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_norm"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(150000.0)).alias("price_floor"),
        F.least(F.col("o_totalprice"), F.lit(400000.0)).alias("price_cap"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
    )


@register(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(embedding[1] AS DOUBLE) AS e1,
           CAST(embedding[64] AS DOUBLE) AS e64,
           CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
             + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE) AS head4,
           CAST(list_max(embedding) AS DOUBLE) AS emax
    FROM embeddings
    """,
)
def q_fn_array(spark, sf_dir):
    """Array library over ARRAY<FLOAT> (the reference's ListValue): size,
    element access, elementwise arithmetic, array max. Floats widen to
    double exactly, so results are bit-stable."""
    e = t(spark, sf_dir, "embeddings")
    el = lambda i: F.element_at("embedding", i).cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        el(1).alias("e1"),
        el(64).alias("e64"),
        (el(1) + el(2) + el(3) + el(4)).alias("head4"),
        F.array_max("embedding").cast("double").alias("emax"),
    )


@register(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           (CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50) AS k_high
    FROM events
    """,
)
def q_fn_json(spark, sf_dir):
    """JSON library: get_json_object over the events.props payload column
    (semi-structured data is first-class at 100TB — schema-on-read)."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        (k.cast("int") >= 50).alias("k_high"),
    )
