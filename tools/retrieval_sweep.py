"""Candidate-count-vs-recall sweep for two-stage retrieval (VERDICT r05
item 5): measure recall@10 of the dense PRF rerank as a function of the
BM25 stage-1 candidate count N (50/100/200), at 1x and Nx corpus scale —
this prices the stage-1 knob a 100 TB deployment tunes (bigger N = more
rerank IO for more recall).

Ground truth per scale: the rerank's own top-10 computed over the FULL
corpus (every doc a candidate) with the SAME PRF query vector — so
recall isolates exactly what candidate pruning loses. Because (dense_ip
DESC, doc_id) is a deterministic total order, recall@10(N) equals
|full-top-10 ∩ candidates(N)| / 10 and is monotone nondecreasing in N
(law-tested in tests/test_wave40.py).

The reranker is IMPORTED from the query module (_two_stage_topk) — a
probe measuring a different algorithm than the shipped query would make
the PERF.md claims unfalsifiable.

Usage: python tools/retrieval_sweep.py [N_scale]   (default 16)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SWEEP_N = (50, 100, 200)
FINAL_K = 10


def main() -> None:
    n_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sf_dir = "/root/testdata/sf0.1"

    from incubator_flink_old_spark import get_spark

    spark = get_spark("retrieval-sweep")
    out = tempfile.mkdtemp(prefix="retrieval_sweep_")
    try:
        _sweep(spark, sf_dir, n_scale, out)
    finally:
        # failure path must not leak the Nx parquet replicas in /tmp
        spark.stop()
        shutil.rmtree(out, ignore_errors=True)


def _sweep(spark, sf_dir: str, n_scale: int, out: str) -> None:
    from pyspark.sql import functions as F  # noqa: F811 (worker clarity)

    from incubator_flink_old_spark.operators.retrieval import bm25_topk
    from incubator_flink_old_spark.queries.llm_ops18 import (
        _TS_TERMS,
        _two_stage_topk,
    )
    from incubator_flink_old_spark.queries.llm_ops26 import _hybrid_topk
    from incubator_flink_old_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    max_doc = docs.agg(F.max("doc_id")).first()[0] + 1

    # Nx replicas: doc_id-shifted docs + ALIGNED vec_id-shifted embeddings
    # with the per-replica grid perturbation (scale_probe_ann's recipe) so
    # dense scores differ across replicas while BM25 text ties break on id.
    def grow(n):
        dparts = [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * max_doc))
            for i in range(n)
        ]
        # Random-SIGN per-(replica, dim) perturbation: a constant shift
        # (scale_probe_ann's +i*1e-4) biases every inner product by
        # i*1e-4*sum(qk), so one extreme replica owns the global dense
        # top-k and recall reads 0 by construction. Sign-mixing keeps
        # replicas distinct while the net ip shift stays ~0.02% of the
        # doc-score spread.
        def perturb(i):
            return F.transform(
                "embedding",
                lambda x, p: x
                + F.lit(i * 1e-4)
                * F.when(
                    F.pmod(F.hash(F.lit(i), p), F.lit(2)) == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0)),
            )

        eparts = [
            emb.select(
                (F.col("vec_id") + F.lit(i * max_doc)).alias("vec_id"),
                perturb(i).alias("embedding"),
                "label",
            )
            for i in range(n)
        ]
        d, e = dparts[0], eparts[0]
        for p in dparts[1:]:
            d = d.unionByName(p)
        for p in eparts[1:]:
            e = e.unionByName(p)
        return d, e

    for scale, n in (("1x", 1), (f"{n_scale}x", n_scale)):
        d, e = grow(n)
        d.write.mode("overwrite").parquet(f"{out}/docs_{scale}")
        e.write.mode("overwrite").parquet(f"{out}/emb_{scale}")
        d = spark.read.parquet(f"{out}/docs_{scale}")
        e = spark.read.parquet(f"{out}/emb_{scale}")
        n_docs = d.count()

        # ground truth: rerank with EVERY doc a candidate (bm25 column
        # unused by the dense ranking; the PRF vector still comes from
        # the true BM25 top-3, which every sweep N shares)
        # PRF feedback must be the true BM25 top-3 (shared by every
        # sweep N), so stitch: the real top-3 rows keep their scores and
        # win the feedback orderBy (BM25 Lucene-form scores are > 0);
        # every OTHER doc enters with bm25=0 (anti-join avoids dup ids).
        top3 = (
            bm25_topk(d, terms=_TS_TERMS, top_k=3)
            .localCheckpoint(eager=True)
        )
        # The stitch is only valid if the true top-3 rows WIN the PRF
        # feedback ordering against the bm25=0 filler — i.e. 3 docs
        # matched _TS_TERMS and all carry strictly positive scores. A
        # silent violation would change the feedback vector and
        # invalidate the recall-vs-N comparison (ADVICE r06).
        top3_rows = top3.select("doc_id", "bm25").collect()
        assert len(top3_rows) == 3, (
            f"PRF stitch precondition broken: BM25 top-3 has "
            f"{len(top3_rows)} rows (fewer than 3 docs match _TS_TERMS)"
        )
        assert min(r.bm25 for r in top3_rows) > 0, (
            "PRF stitch precondition broken: a BM25 top-3 score is not "
            "strictly positive, so bm25=0 filler rows could win the "
            "feedback ordering"
        )
        full_cand = (
            d.select("doc_id", F.lit(0.0).alias("bm25"))
            .join(top3.select("doc_id"), on="doc_id", how="left_anti")
            .unionByName(top3)
        )
        truth = {
            r.doc_id
            for r in _two_stage_topk(
                d, e, final_k=FINAL_K, cand=full_cand
            ).collect()
        }

        results = {}
        for N in SWEEP_N:
            t0 = time.perf_counter()
            cand = bm25_topk(d, terms=_TS_TERMS, top_k=N)
            top = _two_stage_topk(d, e, final_k=FINAL_K, cand=cand)
            got = {r.doc_id for r in top.collect()}
            wall = time.perf_counter() - t0
            # hybrid: SAME stage-1 candidates, plus the IVF-indexed
            # dense arm (the shipped q_retrieval_hybrid body) — the
            # VERDICT r06 item-5 line: does the index hold recall where
            # fixed-N lexical pruning loses it?
            t0 = time.perf_counter()
            hyb = _hybrid_topk(d, e, final_k=FINAL_K, cand=cand)
            hgot = {r.doc_id for r in hyb.collect()}
            hwall = time.perf_counter() - t0
            results[N] = (got, wall, hgot, hwall)
        ref = results[max(SWEEP_N)][0]  # knob-convergence reference
        for N in SWEEP_N:
            got, wall, hgot, hwall = results[N]
            rec = len(got & truth) / FINAL_K
            conv = len(got & ref) / FINAL_K
            hrec = len(hgot & truth) / FINAL_K
            print(
                f"scale={scale} docs={n_docs:,} N={N}: "
                f"recall@{FINAL_K}(vs full dense)={rec:.2f} "
                f"hybrid_recall@{FINAL_K}={hrec:.2f} "
                f"overlap@{FINAL_K}(vs N={max(SWEEP_N)})={conv:.2f} "
                f"wall={wall:.2f}s hybrid_wall={hwall:.2f}s",
                flush=True,
            )
        # Loss attribution: probing ALL cells removes the IVF cell-miss
        # term, leaving only the dense candidate budget — the remaining
        # gap to 1.0 prices dense_n; the gap between the n_probe line
        # above and this one prices n_probe.
        from incubator_flink_old_spark.queries.llm_ops11 import _N_CELLS

        hall = {
            r.doc_id
            for r in _hybrid_topk(
                d,
                e,
                final_k=FINAL_K,
                cand=bm25_topk(d, terms=_TS_TERMS, top_k=max(SWEEP_N)),
                n_probe=_N_CELLS,
            ).collect()
        }
        print(
            f"scale={scale} hybrid_allcells_recall@{FINAL_K}="
            f"{len(hall & truth) / FINAL_K:.2f}  "
            "(gap to the N-line = cell-miss; gap to 1.0 = dense budget)",
            flush=True,
        )


if __name__ == "__main__":
    main()
