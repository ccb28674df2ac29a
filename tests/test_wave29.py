"""Wave-29 surfaces: left-outer stream-stream interval join (null
emission under the watermark rule), MERGE-upsert arm laws, and the
dynamic-partition-pruning plan shape. The oracle gate value-checks the
three registered queries; these tests pin what the hash can't see —
the buffered-vs-emitted boundary, each MERGE arm in isolation, and the
pruning expression actually reaching the fact scan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# merge_upsert arm laws (tiny frames, every arm isolated)
# --------------------------------------------------------------------------
def _merge(spark, base_rows, change_rows):
    from incubator_flink_old_spark.operators.joins import merge_upsert

    base = spark.createDataFrame(base_rows, "k long, v double, tag string")
    ch = spark.createDataFrame(change_rows, "k long, d double, is_del boolean")
    return merge_upsert(
        base,
        ch,
        on="k",
        set_when_matched={"v": F.col("__b.v") + F.col("__c.d")},
        insert_values={
            "v": F.col("__c.d"),
            "tag": F.lit("new"),
        },
        delete_when=F.col("__c.is_del"),
    )


def test_merge_update_arm(spark):
    out = _merge(spark, [(1, 10.0, "a")], [(1, 5.0, False)]).collect()
    assert [(r.k, r.v, r.tag) for r in out] == [(1, 15.0, "a")]


def test_merge_insert_arm(spark):
    out = _merge(spark, [(1, 10.0, "a")], [(2, 7.0, False)])
    rows = sorted((r.k, r.v, r.tag) for r in out.collect())
    assert rows == [(1, 10.0, "a"), (2, 7.0, "new")]


def test_merge_delete_arm(spark):
    out = _merge(
        spark, [(1, 10.0, "a"), (2, 20.0, "b")], [(1, 0.0, True)]
    ).collect()
    assert [(r.k, r.v, r.tag) for r in out] == [(2, 20.0, "b")]


def test_merge_passthrough_untouched(spark):
    out = _merge(spark, [(9, 1.5, "z")], []).collect()
    assert [(r.k, r.v, r.tag) for r in out] == [(9, 1.5, "z")]


def test_merge_null_key_base_row_passes_through(spark):
    # A base row whose merge key is NULL never matches any change (SQL
    # equality) and must pass through UNCHANGED — not be rewritten via
    # the INSERT arm (which would null unlisted columns and take the key
    # from the absent change side). ADVICE r05 medium finding.
    out = _merge(
        spark, [(None, 10.0, "a"), (2, 20.0, "b")], [(2, 5.0, False)]
    )
    rows = sorted(
        ((r.k, r.v, r.tag) for r in out.collect()),
        key=lambda t: (t[0] is not None, t[0] or 0),
    )
    assert rows == [(None, 10.0, "a"), (2, 25.0, "b")]


def test_merge_null_key_change_row_inserts(spark):
    # ANSI law: a NULL-keyed CHANGE row matches nothing, so the NOT
    # MATCHED arm fires — it inserts (with its NULL key), it does not
    # touch existing rows.
    out = _merge(spark, [(1, 10.0, "a")], [(None, 5.0, False)])
    rows = sorted(
        ((r.k, r.v, r.tag) for r in out.collect()),
        key=lambda t: (t[0] is not None, t[0] or 0),
    )
    assert rows == [(None, 5.0, "new"), (1, 10.0, "a")]


def test_merge_delete_does_not_drop_unmatched(spark):
    # a tombstone for key 1 must not take key 2 (NULL-safe keep filter)
    out = _merge(
        spark, [(2, 20.0, "b")], [(1, 0.0, True), (3, 1.0, False)]
    )
    rows = sorted((r.k, r.v, r.tag) for r in out.collect())
    assert rows == [(2, 20.0, "b"), (3, 1.0, "new")]


# --------------------------------------------------------------------------
# DPP plan shape: pruning expression on the fact scan
# --------------------------------------------------------------------------
@pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")
def test_dpp_pruning_expression_reaches_fact_scan(spark):
    from incubator_flink_old_spark.queries.llm_ops15 import _dpp_joined

    j = _dpp_joined(spark, SF)
    exp = j._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruning" in exp.lower(), exp
    part_lines = [ln for ln in exp.splitlines() if "PartitionFilters" in ln]
    assert part_lines and any(
        "dynamicpruning" in ln.lower() for ln in part_lines
    ), part_lines


# --------------------------------------------------------------------------
# Left-outer interval join: the emitted/buffered boundary
# --------------------------------------------------------------------------
@pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")
def test_leftouter_join_null_rows_respect_watermark_rule(spark):
    """Every null-padded click in the streaming output must be older
    than max_click − 20 min (watermark 10 min + join upper 10 min);
    every matched click appears regardless of age; and at least one
    trailing unmatched click is genuinely withheld (the buffered set
    is non-empty on the fixture)."""
    import duckdb

    from incubator_flink_old_spark.queries.llm_ops15 import (
        q_stream_leftouter_join_parity,
    )

    out = q_stream_leftouter_join_parity(spark, SF)
    got = {(r.user_id, r.click_id, r.purchase_id) for r in out.collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    mc = con.execute(
        "SELECT MAX(ts) FROM events WHERE event_type='click'"
    ).fetchone()[0]
    rows = con.execute(
        """
        SELECT l.user_id, l.event_id, r.event_id, l.ts
        FROM events l LEFT JOIN events r
          ON l.user_id = r.user_id AND r.event_type = 'purchase'
         AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL '10 minutes'
        WHERE l.event_type = 'click'
        """
    ).fetchall()
    import datetime

    bound = mc - datetime.timedelta(minutes=20)
    withheld = 0
    for user, click, purchase, ts in rows:
        key = (user, click, purchase)
        if purchase is not None:
            assert key in got, f"matched pair missing: {key}"
        elif ts < bound:
            assert key in got, f"expired unmatched click missing: {key}"
        else:
            assert key not in got, f"buffered click leaked: {key}"
            withheld += 1
    assert withheld > 0, "fixture has no trailing unmatched click"
