"""Windowed/event-time + analytic-window t2 queries (SURVEY §2.10 W1–W6).

Absent in the reference (batch-only Stratosphere era) → engine extensions.
Batch forms run here against DuckDB oracles (time_bucket / gaps-and-
islands SQL); the identical operator functions run on streams in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import dsum, sql_dsum, t
from incubator_flink_old_spark.streaming import (
    dedup_keep_first,
    session_window,
    sliding_window,
    tumbling_window,
)


@register(
    "q_window_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS win_end,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_window_tumbling(spark, sf_dir):
    """W1: 1-hour tumbling windows per event type (epoch-aligned both
    engines)."""
    return tumbling_window(
        t(spark, sf_dir, "events"),
        "ts",
        "1 hour",
        ["event_type"],
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "total_value"),
    )


@register(
    "q_window_sliding",
    oracle=f"""
    SELECT time_bucket(INTERVAL '30 minutes', ts)
             - k * INTERVAL '30 minutes' AS win_start,
           time_bucket(INTERVAL '30 minutes', ts)
             - k * INTERVAL '30 minutes' + INTERVAL '1 hour' AS win_end,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k)
    GROUP BY 1, 2
    """,
)
def q_window_sliding(spark, sf_dir):
    """W2: 1-hour windows sliding every 30 minutes — every event lands in
    exactly 2 windows (oracle expands via the k offsets cross join)."""
    return sliding_window(
        t(spark, sf_dir, "events"),
        "ts",
        "1 hour",
        "30 minutes",
        [],
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "total_value"),
    )


def sessions_cte_sql(gap: str = "5 minutes") -> str:
    """Gaps-and-islands sessionization CTE over ``events`` — THE single
    SQL formulation of Spark's session_window semantics, shared by the
    batch (q_session_window) and streaming-parity
    (q_stream_session_parity) oracles so the two contracts cannot
    drift. Ends with ``sessions (user_id, ts, value, session_id)``.
    Both windows tie-break on event_id: with ORDER BY ts alone, rows
    sharing (user_id, ts) could be ordered on either side of a
    new-session flag row and land in different sessions — while
    Spark's session_window always merges them (gap 0)."""
    return f"""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL '{gap}'
                    OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session,
               event_id
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_id
        FROM flagged
    )"""


@register(
    "q_session_window",
    oracle=f"""
    {sessions_cte_sql("5 minutes")}
    SELECT MIN(ts) AS win_start,
           MAX(ts) + INTERVAL '5 minutes' AS win_end,
           user_id,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_session_window(spark, sf_dir):
    """W3: 5-minute-gap sessions per user. Spark's session_window end =
    last event + gap; the oracle reproduces it with gaps-and-islands SQL
    (the reference-era way to sessionize batch data)."""
    return session_window(
        t(spark, sf_dir, "events"),
        "ts",
        "5 minutes",
        ["user_id"],
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q_event_dedup",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value
    FROM (
        SELECT user_id, event_type, event_id, ts, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id
               ) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_event_dedup(spark, sf_dir):
    """W5 batch form: deterministic keep-earliest dedup per
    (user, event_type); the streaming form
    (dropDuplicatesWithinWatermark) runs in tests/test_streaming.py."""
    return dedup_keep_first(
        t(spark, sf_dir, "events").select(
            "user_id", "event_type", "event_id", "ts", "value"
        ),
        ["user_id", "event_type"],
        [F.col("ts"), F.col("event_id")],
    )


@register(
    "q_window_rank",
    oracle="""
    SELECT event_type, event_id, value,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
    QUALIFY rn <= 10
    """,
)
def q_window_rank(spark, sf_dir):
    """W6: ranking analytics (absent in the reference) — top 10 events by
    value per type with all three rank flavors."""
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            "event_id",
            "value",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 10)
    )


@register(
    "q_window_running_sum",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
           ) AS DOUBLE) AS running_value,
           COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
           ) AS running_n
    FROM events
    """,
)
def q_window_running_sum(spark, sf_dir):
    """W6: running totals per user in event order (decimal-routed so the
    prefix sums are bit-stable in both engines)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast("decimal(27,6)")).over(w).cast("double").alias(
            "running_value"
        ),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@register(
    "q_window_lag",
    oracle="""
    SELECT user_id, event_id, ts,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           CAST(DATE_DIFF('second', LAG(ts) OVER w, ts) AS BIGINT)
               AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_lag(spark, sf_dir):
    """W6: lag/lead navigation per user in event order."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias(
            "secs_since_prev"
        ),
    )
