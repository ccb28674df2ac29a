"""Plan-shape audits for the round-5 query additions: column pruning
reaches the scan (a 100 TB scan that reads unprojected columns is
wrong), partial aggregation stays map-side, and the two-stage rerank's
candidate side broadcasts."""

from __future__ import annotations

import os

import pytest

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")


def test_variant_agg_prunes_scan(spark):
    """q_variant_agg touches only (event_type, props) — the events scan
    must not read ts/user_id/value/event_id."""
    from incubator_flink_old_spark.plans import scan_pushdown
    from incubator_flink_old_spark.queries.llm_ops17 import q_variant_agg

    schemas = " ".join(scan_pushdown(q_variant_agg(spark, SF))["read_schema"])
    assert "props" in schemas and "event_type" in schemas
    for col in ("user_id", "value", "event_id"):
        assert col not in schemas


def test_grouping_id_partial_agg(spark):
    """The grouping-sets plan must keep the partial (map-side) aggregate
    under the Expand — 4x row amplification is combined before the
    exchange."""
    from incubator_flink_old_spark.plans import has_partial_aggregate
    from incubator_flink_old_spark.queries.llm_ops21 import q_grouping_id

    assert has_partial_aggregate(q_grouping_id(spark, SF))


def test_join_null_safe_prunes_scan(spark):
    """q_join_null_safe reads only (event_id, user_id, value) from
    events — text-heavy props must not reach either scan."""
    from incubator_flink_old_spark.plans import scan_pushdown
    from incubator_flink_old_spark.queries.llm_ops21 import q_join_null_safe

    schemas = " ".join(
        scan_pushdown(q_join_null_safe(spark, SF))["read_schema"]
    )
    assert "props" not in schemas and "event_type" not in schemas


def test_two_stage_rerank_broadcasts_candidates(spark):
    """The rerank joins 50 candidate rows against the embeddings — that
    side must broadcast (never shuffle the corpus against 50 rows), and
    no nested-loop join may appear."""
    from incubator_flink_old_spark.plans import join_kinds
    from incubator_flink_old_spark.queries.llm_ops18 import (
        q_retrieval_two_stage,
    )

    kinds = join_kinds(q_retrieval_two_stage(spark, SF))
    assert "BroadcastHashJoin" in kinds
    assert "CartesianProduct" not in kinds
    # no equi-join may degrade to a shuffle of the corpus against the
    # 50 candidates...
    assert "SortMergeJoin" not in kinds
    # ...and the ONLY nested-loop is the intentional 1-row query-vector
    # broadcast crossJoin
    assert kinds.count("BroadcastNestedLoopJoin") == 1


def test_scc_joins_are_equi(spark):
    """The SCC mutuality self-join must plan as an equi join on the
    reversed pair, never a nested loop over the closure."""
    from incubator_flink_old_spark.plans import join_kinds
    from incubator_flink_old_spark.queries.llm_ops20 import q_scc

    kinds = join_kinds(q_scc(spark, SF))
    assert "BroadcastNestedLoopJoin" not in kinds
    assert "CartesianProduct" not in kinds
