"""Wave-44 laws: the dense known-item MRR eval (q_retrieval_eval_mrr_dense)
— probe pruning is the ONLY approximation (all-cells ≡ brute force) and
the identity mask is exact (self_rank 1 everywhere) — and the watermarked
streaming near-dup screen (parity with the unwatermarked form and the
batch oracle; fail-loudly on a missing event-time column)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")


def test_dense_mrr_all_cells_equals_brute(spark):
    """n_probe = n_cells removes probe pruning, the serve's only
    approximation: the self-rank rows must equal a direct brute-force
    rank of the same masked queries over the whole corpus."""
    from incubator_flink_old_spark.operators.similarity import (
        as_double_array,
        cosine,
    )
    from incubator_flink_old_spark.queries._util import t
    from incubator_flink_old_spark.queries.llm_ops11 import _N_CELLS
    from incubator_flink_old_spark.queries.llm_ops29 import (
        _DENSE_TOPK,
        _dense_mrr,
        _masked_queries,
    )

    got = sorted(
        (r.q_id, r.self_rank, r.rr)
        for r in _dense_mrr(spark, SF, n_probe=_N_CELLS).collect()
    )
    emb = t(spark, SF, "embeddings")
    q = _masked_queries(emb, 3)
    cvec = emb.select("vec_id", as_double_array("embedding").alias("v"))
    ranked = (
        F.broadcast(q)
        .crossJoin(cvec)
        .select("q_id", "vec_id", cosine(F.col("qv"), F.col("v")).alias("cos"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.col("cos").desc(), "vec_id"
                )
            ),
        )
        .filter(
            (F.col("rnk") <= _DENSE_TOPK) & (F.col("vec_id") == F.col("q_id"))
        )
    )
    hits = {r.q_id: r.rnk for r in ranked.collect()}
    want = sorted(
        (qid, hits.get(qid, 0), 1.0 / hits[qid] if qid in hits else 0.0)
        for qid in {g[0] for g in got}
    )
    assert got == want


def test_dense_mrr_identity_mask_is_exact(spark):
    """mask_mod=None (no degradation): the query IS its document's
    vector, its top probe cell is its own assignment cell (identical
    quantization + arithmetic), and self-cosine 1.0 is the maximum —
    every query must report self_rank 1, rr 1.0."""
    from incubator_flink_old_spark.queries.llm_ops29 import _dense_mrr

    rows = _dense_mrr(spark, SF, mask_mod=None).collect()
    assert len(rows) == 10
    assert all(r.self_rank == 1 and r.rr == 1.0 for r in rows)


def test_dense_mrr_plan_has_no_cartesian(spark):
    """The serve must stay broadcast/equi-joined: query×centers rides a
    broadcast, candidates an equi-join on cell, ranking equi-joins on
    vec_id/q_id — a CartesianProduct anywhere would be corpus×corpus."""
    from incubator_flink_old_spark.queries.llm_ops29 import (
        q_retrieval_eval_mrr_dense,
    )

    plan = q_retrieval_eval_mrr_dense(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
