"""Wave-35 surfaces: the null-safe join must stay a hash/merge join
(not degrade to a nested loop), the map round-trip must be
shuffle-order deterministic, and grouping_id must emit all four
levels with a correct grand total."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")


def test_null_safe_join_is_equi_planned(spark):
    """EqualNullSafe must plan as a JOIN KEY (hash/sort-merge join),
    never as a BroadcastNestedLoop/cartesian residual — the property
    that makes the null-safe form free at 100 TB."""
    from incubator_flink_old_spark.queries.llm_ops21 import q_join_null_safe

    plan = (
        q_join_null_safe(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert any(
        j in plan
        for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
    )


def test_null_safe_join_keeps_null_bucket(spark):
    """The NULL group-key row must survive the join (the entire point);
    a plain = join on the same frames must drop it."""
    from incubator_flink_old_spark.queries.llm_ops21 import q_join_null_safe

    rows = q_join_null_safe(spark, SF).collect()
    assert any(r.k is None for r in rows)


def test_map_ops_shuffle_order_invariant(spark):
    """The sorted-entries map construction must produce identical
    results under different partitioning (collect_list order varies;
    array_sort pins it)."""
    from incubator_flink_old_spark.queries.llm_ops21 import q_map_ops

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = {tuple(r) for r in q_map_ops(spark, SF).collect()}
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = {tuple(r) for r in q_map_ops(spark, SF).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b and len(a) > 0


def test_grouping_id_levels(spark):
    """All four grouping-set levels must be present and self-consistent:
    the grand-total row (gid=3) counts every event, and the per-type
    level (gid=1) sums to the same total."""
    from incubator_flink_old_spark.queries.llm_ops21 import q_grouping_id
    from incubator_flink_old_spark.sources import load_table

    rows = q_grouping_id(spark, SF).collect()
    gids = {r.gid for r in rows}
    assert gids == {0, 1, 2, 3}
    n_events = load_table(spark, SF, "events").count()
    [total] = [r for r in rows if r.gid == 3]
    assert total.n == n_events
    assert sum(r.n for r in rows if r.gid == 1) == n_events
