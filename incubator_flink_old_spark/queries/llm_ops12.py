"""Training-data pipeline queries, wave 24 (round 5): the Z-ORDER
materialized layout — the multi-dimensional member of the layout family
(band-bucketed join layout → q_dedup_minhash_layout; by-cell partition
layout → q_ann_recall_ivf_layout; space-filling-curve clustering → this
module). A fact table clustered along the Morton curve of (user_id,
event time) keeps parquet row-group min/max tight on BOTH dimensions at
once, so a 2-D rectangle probe — the "this cohort, this week" query
every event store runs — prunes to O(result) row groups instead of
scanning the full table on the un-partitioned dimension.
`tools/zorder_probe.py` measures the bytes-read ratio vs a natural
layout at sf0.1; tests/test_wave24.py asserts both range predicates
reach the layout scan as PushedFilters.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import dsum, sql_dsum, t

# Rectangle bounds as integer per-mille fractions of each dimension's
# span — computed with IDENTICAL integer arithmetic on both engines
# (floor division of non-negative BIGINTs), so the probe predicate is
# value-identical in Spark and DuckDB.
_U_LO, _U_HI = 20, 45  # user_id: [20%, 45%] of the id span
_T_LO, _T_HI = 30, 55  # event time: [30%, 55%] of the time span

_ZORDER_ORACLE = f"""
    WITH b AS (
        SELECT MIN(user_id) AS minu, MAX(user_id) AS maxu,
               MIN(epoch_us(ts)) AS mint, MAX(epoch_us(ts)) AS maxt
        FROM events)
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
           {sql_dsum('e.value')} AS total_value
    FROM events e, b
    WHERE e.user_id >= b.minu + ((b.maxu - b.minu) * {_U_LO}) // 100
      AND e.user_id <= b.minu + ((b.maxu - b.minu) * {_U_HI}) // 100
      AND epoch_us(e.ts) >= b.mint + ((b.maxt - b.mint) * {_T_LO}) // 100
      AND epoch_us(e.ts) <= b.mint + ((b.maxt - b.mint) * {_T_HI}) // 100
    GROUP BY e.event_type
    """


def _zorder_write_and_probe(spark, sf_dir):
    """Shared body: build the z-ordered layout, return (probe_df,
    layout_path). Split out so the plan-shape test can assert on the
    exact probe plan the query returns."""
    from incubator_flink_old_spark.operators.layout import write_zordered

    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        # parquet ts is TIMESTAMP_NTZ; the session tz is pinned UTC
        # (session.py), so the cast is value-stable and unix_micros
        # equals DuckDB's epoch_us on the naive value.
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        "event_type",
        "value",
    )
    # Bounded driver-side finish (the Bloom-word-array precedent): ONE
    # min/max row steers both the grid and the literal probe bounds —
    # literals are what lets the predicate reach the parquet footer as
    # a PushedFilter; a join-derived bound never prunes at the scan.
    minu, maxu, mint, maxt = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("t_us"), F.max("t_us")
    ).collect()[0]
    path = tempfile.mkdtemp(prefix="t2_zorder_") + "/events_z"
    write_zordered(
        ev,
        path,
        dims=[(F.col("user_id"), minu, maxu), (F.col("t_us"), mint, maxt)],
        bits=16,
        n_files=16,
    )
    lo_u = minu + (maxu - minu) * _U_LO // 100
    hi_u = minu + (maxu - minu) * _U_HI // 100
    lo_t = mint + (maxt - mint) * _T_LO // 100
    hi_t = mint + (maxt - mint) * _T_HI // 100
    stored = spark.read.parquet(path)
    probe = stored.filter(
        (F.col("user_id") >= F.lit(lo_u))
        & (F.col("user_id") <= F.lit(hi_u))
        & (F.col("t_us") >= F.lit(lo_t))
        & (F.col("t_us") <= F.lit(hi_t))
    )
    return probe, path


@register("q_zorder_layout", oracle=_ZORDER_ORACLE)
def q_zorder_layout(spark, sf_dir):
    """The MULTI-DIMENSIONAL layout posture as a driver row: events are
    written clustered along the Morton curve of (user_id, event-time) —
    operators/layout.write_zordered, pure Column bit arithmetic, one
    repartitionByRange as the build's only shuffle — and the probe is a
    2-D rectangle (a 25%-of-users × 25%-of-time cohort window) answered
    from the layout with BOTH range predicates pushed to the parquet
    scan (tests/test_wave24.py asserts the PushedFilters; the bytes-read
    ratio vs a natural layout is measured in tools/zorder_probe.py).
    The aggregate (events, distinct users, decimal-staged value total
    per event type) is value-identical to the plain-scan oracle because
    the layout permutes rows, never changes them; bounds are integer
    floor-division per-mille marks of each dimension's span, replayed
    exactly in SQL. Scale: at 100 TB this is the difference between
    reading O(result) row groups and scanning a week of the full
    firehose for every cohort query."""
    probe, _ = _zorder_write_and_probe(spark, sf_dir)
    return probe.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum("value", "total_value"),
    )
