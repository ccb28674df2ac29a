"""Training-data pipeline queries, wave 35: three relational-semantics
surfaces the inventory still lacked a driver row for —

- NULL-SAFE equi join (``eqNullSafe`` / SQL ``IS NOT DISTINCT FROM``):
  the join that treats NULL keys as EQUAL, which ordinary ``=`` joins
  silently drop — the classic bug when joining two grouped summaries
  whose group key has a NULL bucket;
- MAP-typed columns (build / size / point-lookup / fold): the last
  complex type (struct and array are covered across the registry)
  exercised end-to-end through an aggregate→map→extract round-trip;
- ``grouping_id()`` over GROUPING SETS: the bitmask that tells a
  multi-level rollup consumer WHICH level each row belongs to —
  without it, a NULL group key is indistinguishable from the
  aggregated-away level (exactly the ambiguity the null-safe join
  query demonstrates from the other side).

All three are pure integer/decimal-staged arithmetic — no float-fold
hazards anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import t

# ---------------------------------------------------------------------------
# Null-safe equi join
# ---------------------------------------------------------------------------

_NULLSAFE_ORACLE = """
    WITH a AS (
        SELECT NULLIF(user_id % 5, 2) AS k,
               CAST(COUNT(*) AS BIGINT) AS n_a,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_a
        FROM events WHERE event_id % 2 = 0 GROUP BY 1),
    b AS (
        SELECT NULLIF(user_id % 5, 2) AS k,
               CAST(COUNT(*) AS BIGINT) AS n_b,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_b
        FROM events WHERE event_id % 2 = 1 GROUP BY 1)
    SELECT a.k, a.n_a, a.sum_a, b.n_b, b.sum_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """


@register("q_join_null_safe", oracle=_NULLSAFE_ORACLE)
def q_join_null_safe(spark, sf_dir):
    """NULL-SAFE equi join (J-family completion): two grouped summaries
    of disjoint event halves are joined on a NULLABLE group key
    (bucket 2 is NULLed out on both sides) with ``eqNullSafe`` —
    NULL==NULL matches, so the NULL bucket's row survives where a plain
    ``=`` join would silently drop it. The oracle is the ANSI
    ``IS NOT DISTINCT FROM`` form.

    Scale: Catalyst plans eqNullSafe as an ordinary hash join on a
    null-coalesced key (EqualNullSafe is a join key, not a residual
    filter), so the shape is identical to the plain equi join —
    tests/test_wave35.py asserts no BroadcastNestedLoop/cartesian
    sneaks in. Joining AGGREGATES (one row per key per side) keeps the
    NULL bucket a single row, not an |nulls|² blow-up — the production
    rule for null-heavy keys."""
    ev = t(spark, sf_dir, "events")
    k = F.nullif(F.col("user_id") % 5, F.lit(2)).alias("k")

    def side(parity: int, n_name: str, s_name: str):
        return (
            ev.filter(F.col("event_id") % 2 == parity)
            .select(k, "value")
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).alias(n_name),
                F.sum(F.col("value").cast("decimal(27,6)"))
                .cast("double")
                .alias(s_name),
            )
        )

    a = side(0, "n_a", "sum_a")
    b = side(1, "n_b", "sum_b").withColumnRenamed("k", "kb")
    return a.join(b, a.k.eqNullSafe(F.col("kb"))).select(
        "k", "n_a", "sum_a", "n_b", "sum_b"
    )


# ---------------------------------------------------------------------------
# Map-typed column round-trip
# ---------------------------------------------------------------------------

_MAP_ORACLE = """
    SELECT user_id,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END)
                AS BIGINT) AS n_click,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END)
                AS BIGINT) AS n_error,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM events
    GROUP BY user_id
    """


@register("q_map_ops", oracle=_MAP_ORACLE)
def q_map_ops(spark, sf_dir):
    """MAP-typed column surface: per user, the event-type histogram is
    materialized as a genuine ``map<string,bigint>`` column
    (map_from_entries over a sorted entry list) and every downstream
    metric is read back THROUGH the map — size() for the distinct-type
    count, element_at() point lookups (NULL-safe: absent key → NULL →
    coalesce 0), and a fold over map_values for the total. The oracle
    computes the flat equivalents; equality proves the map round-trip
    is lossless.

    The map type is how a 100 TB feature store ships per-entity sparse
    histograms (one row per entity, not one per entity×type); the
    entry list is sorted before map construction so the column is
    byte-deterministic under any shuffle order.

    Scale: one shuffle (user_id, event_type) for the histogram, one
    (user_id) for the map assembly — both map-side combined; every map
    operation afterwards is a narrow Column expression."""
    ev = t(spark, sf_dir, "events")
    hist = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = hist.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    zero = F.lit(0).cast("long")
    return m.select(
        "user_id",
        F.size("m").cast("long").alias("n_types"),
        F.coalesce(F.element_at("m", "click"), zero).alias("n_click"),
        F.coalesce(F.element_at("m", "error"), zero).alias("n_error"),
        F.aggregate(
            F.map_values("m"), zero, lambda acc, x: acc + x
        ).alias("n_total"),
    )


# ---------------------------------------------------------------------------
# grouping_id over GROUPING SETS
# ---------------------------------------------------------------------------

_GID_ORACLE = """
    SELECT event_type,
           CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
           CAST(GROUPING(event_type,
                         CAST(DATE_TRUNC('day', ts) AS DATE)) AS BIGINT)
               AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY GROUPING SETS
        ((event_type, CAST(DATE_TRUNC('day', ts) AS DATE)),
         (event_type),
         (CAST(DATE_TRUNC('day', ts) AS DATE)),
         ())
    """


@register("q_grouping_id", oracle=_GID_ORACLE)
def q_grouping_id(spark, sf_dir):
    """GROUPING SETS with ``grouping_id()`` — the level bitmask
    (event_type = high bit, day = low bit; 0 = finest cell, 3 = grand
    total) that lets a rollup consumer tell "NULL because aggregated
    away" from "NULL group key" (the same ambiguity q_join_null_safe
    attacks from the join side). Complements q_agg_cube/q_agg_rollup
    (A7), which emit the levels without the discriminator.

    Exactness: both engines define the bitmask identically (first
    listed column = most significant). Scale: one Expand + partial agg
    — 4 rows per input row pre-combine, the standard multi-level
    rollup plan."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "value",
    )
    ev.createOrReplaceTempView("t2_gid_events")
    return spark.sql(
        """
        SELECT event_type, day,
               CAST(grouping_id(event_type, day) AS BIGINT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
                   AS sum_value
        FROM t2_gid_events
        GROUP BY GROUPING SETS ((event_type, day), (event_type), (day), ())
        """
    )
