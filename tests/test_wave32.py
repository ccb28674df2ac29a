"""Wave-32 surfaces: the runtime bloom-filter injection actually fires
(the plan claim q_bloom_runtime_join's docstring makes), conf hygiene
(forcing never leaks), SQ8 code-range law, and two-stage containment."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")


def test_bloom_filter_actually_injected(spark):
    """Under the forced confs the optimized plan must contain the
    might_contain runtime predicate on the fact side — the entire point
    of the query. (At 100 TB the default thresholds fire unforced; the
    forcing recreates the dim/fact size ratio at test scale.)"""
    from incubator_flink_old_spark.queries.llm_ops18 import (
        _BLOOM_CONFS,
        _bloom_join_df,
    )

    saved = {c: spark.conf.get(c, None) for c, _ in _BLOOM_CONFS}
    for c, v in _BLOOM_CONFS:
        spark.conf.set(c, v)
    try:
        plan = (
            _bloom_join_df(spark, SF)._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
    finally:
        for c, v in saved.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)
    assert "might_contain" in plan
    assert "bloom_filter_agg" in plan


def test_bloom_query_restores_confs(spark):
    """q_bloom_runtime_join must leave every forced conf exactly as it
    found it — sibling queries in the same driver session must not
    inherit the disabled broadcast threshold."""
    from incubator_flink_old_spark.queries.llm_ops18 import (
        _BLOOM_CONFS,
        q_bloom_runtime_join,
    )

    before = {c: spark.conf.get(c, None) for c, _ in _BLOOM_CONFS}
    out = q_bloom_runtime_join(spark, SF)
    after = {c: spark.conf.get(c, None) for c, _ in _BLOOM_CONFS}
    assert before == after
    assert out.count() > 0  # checkpointed frame survives conf restore


def test_sq8_codes_in_int8_range(spark):
    """Every SQ code must land in [0, 255] (the advertised int8 budget)
    and each dimension must actually use both endpoints (min-max
    quantization maps lo→0 and hi→255 by construction)."""
    from incubator_flink_old_spark.queries.llm_ops18 import (
        _SQ_LEVELS,
        _grid_vec,
    )
    from incubator_flink_old_spark.sources import load_table

    emb = load_table(spark, SF, "embeddings")
    eg = emb.select("vec_id", _grid_vec().alias("k"))
    dims = eg.select(F.posexplode("k").alias("p", "v"))
    mm = dims.groupBy("p").agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    codes = dims.join(mm, on="p").select(
        "p", F.expr(f"(v - lo) * {_SQ_LEVELS} div (hi - lo)").alias("c")
    )
    stats = codes.groupBy("p").agg(
        F.min("c").alias("cmin"), F.max("c").alias("cmax")
    )
    bad = stats.filter(
        (F.col("cmin") != 0) | (F.col("cmax") != _SQ_LEVELS)
    ).count()
    assert bad == 0


def test_two_stage_final_subset_of_candidates(spark):
    """The reranked top-10 must be a subset of the BM25 top-50 (stage 2
    only reorders stage 1's candidates) and must arrive sorted by
    (dense_ip desc, doc_id)."""
    from incubator_flink_old_spark.operators.retrieval import bm25_topk
    from incubator_flink_old_spark.queries.llm_ops18 import (
        _TS_CANDIDATES,
        _TS_FINAL,
        _TS_TERMS,
        q_retrieval_two_stage,
    )
    from incubator_flink_old_spark.sources import load_table

    rows = q_retrieval_two_stage(spark, SF).collect()
    assert len(rows) == _TS_FINAL
    cand = {
        r.doc_id
        for r in bm25_topk(
            load_table(spark, SF, "documents"),
            terms=_TS_TERMS,
            top_k=_TS_CANDIDATES,
        ).collect()
    }
    assert {r.doc_id for r in rows} <= cand
    keys = [(-r.dense_ip, r.doc_id) for r in rows]
    assert keys == sorted(keys)
