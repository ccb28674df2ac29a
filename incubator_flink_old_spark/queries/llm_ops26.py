"""Training-data pipeline queries, wave 41 (round 7, VERDICT r06 item
5): HYBRID retrieval — the two-stage lexical rerank's dense stage wired
to the IVF index, the deployment consequence the round-6 candidate-count
sweep priced (PERF.md r06: fixed-N lexical pruning loses dense recall as
the corpus grows; "the dense stage needs its own index instead of riding
stage-1 pruning"). Stage 1 prunes lexically (BM25 top-N), stage 2
retrieves dense candidates from the PRF vector's probed IVF cells, the
union is reranked by exact integer dense score.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import t

#: Dense candidates retrieved from the probed IVF cells — the second
#: arm of the hybrid union, sized like the lexical arm so neither stage
#: dominates the candidate budget.
_HY_DENSE = 50


def _hybrid_oracle() -> str:
    from incubator_flink_old_spark.queries.llm_ops11 import (
        _DIM,
        _N_PROBE,
        _grid_ivf_ctes,
        _sql_cos,
    )
    from incubator_flink_old_spark.queries.llm_ops18 import (
        _TS_FEEDBACK,
        _TS_FINAL,
        _bm25_ctes,
    )

    ivf_ctes, last_centers = _grid_ivf_ctes()

    def _dot(a: str, b: str) -> str:
        return (
            f"list_dot_product(list_transform({a}, x -> CAST(x AS DOUBLE)),"
            f" list_transform({b}, x -> CAST(x AS DOUBLE)))"
        )

    return f"""
    WITH {ivf_ctes},
    {_bm25_ctes()},
    fb AS (
        SELECT doc_id FROM cand ORDER BY bm25 DESC, doc_id
        LIMIT {_TS_FEEDBACK}),
    qv AS (
        SELECT r.p AS p, SUM(e.k[r.p]) AS v
        FROM fb JOIN e ON fb.doc_id = e.vec_id, range(1, {_DIM + 1}) r(p)
        GROUP BY r.p),
    qvec AS (SELECT list(v ORDER BY p) AS qk FROM qv),
    pr AS (
        SELECT cell FROM (
            SELECT c.cell,
                   ROW_NUMBER() OVER (
                       ORDER BY {_sql_cos('q.qk', 'c.cv')} DESC, c.cell
                   ) AS rn
            FROM qvec q CROSS JOIN {last_centers} c) t
        WHERE rn <= {_N_PROBE}),
    dc AS (
        SELECT vec_id AS doc_id FROM (
            SELECT a.vec_id,
                   ROW_NUMBER() OVER (
                       ORDER BY {_dot('q.qk', 'a.k')} DESC, a.vec_id
                   ) AS rn
            FROM pr JOIN af a ON pr.cell = a.cell CROSS JOIN qvec q) t
        WHERE rn <= {_HY_DENSE}),
    uc AS (
        SELECT COALESCE(c.doc_id, d.doc_id) AS doc_id,
               COALESCE(c.bm25, 0.0) AS bm25
        FROM cand c FULL OUTER JOIN dc d ON c.doc_id = d.doc_id),
    scored AS (
        SELECT u.doc_id, u.bm25,
               CAST({_dot('q.qk', 'e.k')} AS BIGINT) AS dense_ip
        FROM uc u JOIN e ON u.doc_id = e.vec_id CROSS JOIN qvec q)
    SELECT doc_id, bm25, dense_ip
    FROM scored
    ORDER BY dense_ip DESC, doc_id
    LIMIT {_TS_FINAL}
    """


def _hybrid_topk(
    docs,
    emb,
    n_candidates: int | None = None,
    dense_n: int = _HY_DENSE,
    n_probe: int | None = None,
    final_k: int | None = None,
    cand=None,
):
    """Shared hybrid body (BM25 top-``n_candidates`` ∪ IVF-probed dense
    top-``dense_n`` → exact dense rerank → top-``final_k``), factored so
    the candidate sweep and the law tests measure the SHIPPED algorithm.
    ``cand`` overrides stage 1 with an explicit (doc_id, bm25) frame;
    ``n_probe`` widened to n_cells makes the dense arm an unpruned scan
    (the all-cells composition law)."""
    from incubator_flink_old_spark.operators.retrieval import bm25_topk
    from incubator_flink_old_spark.operators.similarity import (
        as_double_array,
        cosine_safe,
        dot,
        grid_ivf,
    )
    from incubator_flink_old_spark.queries.llm_ops11 import (
        _ITERS,
        _N_CELLS,
        _N_PROBE,
    )
    from incubator_flink_old_spark.queries.llm_ops18 import (
        _TS_CANDIDATES,
        _TS_FINAL,
        _TS_TERMS,
        _grid_vec,
        _prf_qvec,
    )

    n_candidates = _TS_CANDIDATES if n_candidates is None else n_candidates
    n_probe = _N_PROBE if n_probe is None else n_probe
    final_k = _TS_FINAL if final_k is None else final_k

    if cand is None:
        cand = bm25_topk(docs, terms=_TS_TERMS, top_k=n_candidates)
    # |n_candidates| rows by construction — pin so stage 1 runs once,
    # not once per consumer (PRF vector, union, final bm25 column).
    cand = cand.localCheckpoint(eager=True)

    eg = emb.select("vec_id", _grid_vec().alias("k"))
    qvec = _prf_qvec(cand, eg)

    # Dense arm: probe the PRF vector's nearest cells, rank ONLY the
    # probed-cell vectors by exact integer dense score. One 1-row
    # broadcast (qvec) × one n_cells-row broadcast (centers) picks the
    # cells; the pool is reached through an equi-join on cell, so at
    # 100 TB the scan is partition-pruned under the by-cell layout
    # (q_ann_recall_ivf_layout's posture) and the TakeOrdered tail
    # merges per-partition top-k — never a global window.
    cells, centers = grid_ivf(emb, n_cells=_N_CELLS, iters=_ITERS)
    probes = (
        F.broadcast(qvec)
        .crossJoin(F.broadcast(centers))
        .select(
            "cell",
            cosine_safe(F.col("qk"), as_double_array("cv")).alias("__sim"),
        )
        .orderBy(F.col("__sim").desc(), "cell")
        .limit(n_probe)
        .select("cell")
    )
    kd = F.transform("k", lambda x: x.cast("double"))
    dense_cand = (
        F.broadcast(probes)
        .join(cells, on="cell")
        .select("vec_id")
        .join(eg, on="vec_id")
        .crossJoin(F.broadcast(qvec))
        .select(
            F.col("vec_id").alias("doc_id"),
            dot(F.col("qk"), kd).alias("__ip"),
        )
        .orderBy(F.col("__ip").desc(), "doc_id")
        .limit(dense_n)
        .select("doc_id")
    )

    # Union of the two bounded candidate arms; lexical keeps its BM25
    # score, dense-only docs enter at 0.0 (they were found by the index,
    # not the terms).
    union_cand = (
        cand.join(dense_cand, on="doc_id", how="full")
        .select("doc_id", F.coalesce("bm25", F.lit(0.0)).alias("bm25"))
    )
    scored = (
        union_cand.join(eg, union_cand.doc_id == eg.vec_id)
        .crossJoin(F.broadcast(qvec))
        .select(
            "doc_id",
            "bm25",
            dot(F.col("qk"), kd).cast("long").alias("dense_ip"),
        )
    )
    return scored.orderBy(F.col("dense_ip").desc(), "doc_id").limit(final_k)


@register("q_retrieval_hybrid", oracle=_hybrid_oracle())
def q_retrieval_hybrid(spark, sf_dir):
    """HYBRID retrieval — lexical candidates ∪ IVF-indexed dense
    candidates, reranked by exact dense score: the deployment fix the
    round-6 sweep demanded. tools/retrieval_sweep.py measured that the
    two-stage topology's dense recall decays with corpus growth at fixed
    stage-1 N (recall→0 at 16× — PERF.md r06), because stage 2 only ever
    sees lexically-surfaced docs. Here stage 2 retrieves its own
    candidates from the IVF index (the q_ann_recall_ivfsq8 probe
    machinery): the PRF query vector probes its top cells, the
    probed-cell vectors are ranked by the same exact integer dense score
    the rerank uses, and the top-{_HY_DENSE} join the BM25 top-N in one
    candidate pool. A dense-global winner the terms never mention now
    reaches the rerank through the index arm.

    Cross-engine exactness: BM25 per-term conditional sums (the
    established fold), Lloyd/assignment integer arithmetic replayed by
    _grid_ivf_ctes, PRF sums and dense scores are integer-grid dot
    products < 2^53 (exact under any fold order), cell probing uses
    cosine_safe ⇄ _sql_cos (exact int operands, correctly-rounded
    sqrt/div — bit-identical), so the full WITH-chain replays
    value-level.

    Scale: every candidate arm is bounded (top-N TakeOrdered lexically;
    probed-cells equi-join + TakeOrdered densely); the corpus is never
    cross-joined or globally windowed; qvec/centers/probes/query-side
    unions are 1-to-n_cells-row broadcasts. At 100 TB the dense arm
    reads only probed-cell partitions of the by-cell layout and the
    lexical arm rides the vocabulary-keyed shuffles — the two prune
    dimensions (terms, cells) are independent, which is exactly why the
    union holds recall where either alone decays."""
    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    return _hybrid_topk(docs, emb)
