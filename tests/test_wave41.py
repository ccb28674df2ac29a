"""Round-7 hybrid-retrieval laws (VERDICT r06 item 5): the lexical ∪
IVF-dense candidate union must (a) degrade to the exact global dense
top-k when the index arm is unpruned — all cells probed, dense budget ≥
corpus — and (b) dominate the lexical-only two-stage recall at every
stage-1 N, because the candidate set is a superset and the rerank is a
deterministic total order on the same key (the containment law)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")


def _frames(spark):
    from incubator_flink_old_spark.queries._util import t

    return t(spark, SF, "documents"), t(spark, SF, "embeddings")


def _global_dense_topk(docs, emb, k):
    """Exact global top-k by (dense_ip desc, doc_id) under the SHIPPED
    PRF vector — the truth every hybrid/two-stage recall compares to."""
    from incubator_flink_old_spark.operators.retrieval import bm25_topk
    from incubator_flink_old_spark.operators.similarity import dot
    from incubator_flink_old_spark.queries.llm_ops18 import (
        _TS_FEEDBACK,
        _TS_TERMS,
        _grid_vec,
        _prf_qvec,
    )

    eg = emb.select("vec_id", _grid_vec().alias("k"))
    cand = bm25_topk(docs, terms=_TS_TERMS, top_k=_TS_FEEDBACK)
    qvec = _prf_qvec(cand, eg)
    scored = (
        eg.crossJoin(F.broadcast(qvec))
        .select(
            F.col("vec_id").alias("doc_id"),
            dot(
                F.col("qk"), F.transform("k", lambda x: x.cast("double"))
            )
            .cast("long")
            .alias("dense_ip"),
        )
    )
    return [
        r.doc_id
        for r in scored.orderBy(F.col("dense_ip").desc(), "doc_id")
        .limit(k)
        .collect()
    ]


def test_hybrid_unpruned_equals_global_dense_topk(spark):
    """All cells probed + dense budget ≥ corpus ⇒ the dense arm is an
    unpruned corpus scan, so the hybrid's final top-k IS the global
    dense top-k — pruning only ever removes candidates, and the rerank
    key is identical."""
    from incubator_flink_old_spark.queries.llm_ops11 import _N_CELLS
    from incubator_flink_old_spark.queries.llm_ops26 import _hybrid_topk

    docs, emb = _frames(spark)
    n = emb.count()
    got = [
        r.doc_id
        for r in _hybrid_topk(
            docs, emb, dense_n=n, n_probe=_N_CELLS
        ).collect()
    ]
    assert got == _global_dense_topk(docs, emb, len(got))


def test_hybrid_recall_dominates_two_stage(spark):
    """Superset law: hybrid(N) candidates ⊇ two_stage(N) candidates and
    both rerank by the same deterministic key, so hybrid recall@k ≥
    lexical-only recall@k at every N — the property the round-6 sweep
    showed fixed-N pruning alone loses."""
    from incubator_flink_old_spark.queries.llm_ops18 import (
        _TS_FINAL,
        _two_stage_topk,
    )
    from incubator_flink_old_spark.queries.llm_ops26 import _hybrid_topk

    docs, emb = _frames(spark)
    truth = set(_global_dense_topk(docs, emb, _TS_FINAL))
    dominated = False
    for n in (5, 15):
        lex = {
            r.doc_id
            for r in _two_stage_topk(docs, emb, n_candidates=n).collect()
        }
        hyb = {
            r.doc_id
            for r in _hybrid_topk(docs, emb, n_candidates=n).collect()
        }
        assert len(hyb & truth) >= len(lex & truth), n
        dominated = dominated or len(hyb & truth) > len(lex & truth)
    # at the smallest N the index arm must actually ADD recall on this
    # fixture (strictly greater somewhere), else the test is vacuous
    assert dominated
