"""Plan-shape audits for the round-6 additions (guardrail: every new
layout/stream query gets its plan pinned): the IVF+SQ8 composition must
keep its candidate path equi-joined and its small sides broadcast, and
the streaming as-of plan must carry the custom state operator keyed on
the enrichment key — the shapes the 100 TB claims rest on."""

from __future__ import annotations

import os

import pytest

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")


def test_ivfsq8_no_nested_loop_and_broadcasts(spark):
    """The composed IVF+SQ8 search: every join is an equi-join (cell /
    vec_id / q_id keys) except the one deliberate 20-row broadcast
    cross (query codes) — a nested-loop join over the CORPUS would mean
    the prune fell out of the plan."""
    from incubator_flink_old_spark.plans import explain_str
    from incubator_flink_old_spark.queries.llm_ops25 import (
        q_ann_recall_ivfsq8,
    )

    plan = explain_str(q_ann_recall_ivfsq8(spark, SF))
    # the corpus-sized candidate ranking must ride hash joins
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    # cartesian products are allowed only as broadcast nested loops over
    # the bounded (n_cells / 20-query) sides — never a shuffle cartesian
    assert "CartesianProduct" not in plan


def test_ivfsq8_scan_prunes_embeddings(spark):
    """The embeddings scans feed vec_id/embedding/label only — at 100 TB
    reading an unprojected column class dominates IO."""
    from incubator_flink_old_spark.plans import scan_pushdown
    from incubator_flink_old_spark.queries.llm_ops25 import (
        q_ann_recall_ivfsq8,
    )

    info = scan_pushdown(q_ann_recall_ivfsq8(spark, SF))
    assert info["read_schema"], "no scans found"


def test_stream_asof_state_keyed_on_user(spark, tmp_path):
    """The streaming as-of plan carries FlatMapGroupsInPandasWithState
    keyed on user_id — the state operator the enrichment rides; without
    it the query silently degrades to a stateless map."""
    import time as _time

    from incubator_flink_old_spark.streaming import stateful_asof_enrich

    schema = "user_id long, event_id long, ep double, event_type string"
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(
        [(1, 1, 1.0, "click")], schema
    ).repartition(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stateful_asof_enrich(stream)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "FlatMapGroupsInPandasWithState" in plan
    assert "user_id" in plan
