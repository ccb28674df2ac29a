"""Optimization round 12: decompose the MinHash pair-pipeline's cost at
sf0.1 — which stage owns the ~30 executor-run-time seconds the cluster
family pays per query (tokenize+hash? band join+distinct? verify?).

Each piece is isolated with the noop sink on a warm session (guide §1.4)
and stage-attributed via bench.StageMetrics. Run on a quiet box.

Usage: python tools/minhash_decomp_probe.py [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]

    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    from pyspark.sql import functions as F

    from bench import StageMetrics
    from incubator_flink_old_spark import get_spark
    from incubator_flink_old_spark.operators.text import (
        _hashed_set,
        band_candidates,
        minhash_bands,
        minhash_lsh_pairs,
        minhash_signature,
        tokens,
    )
    from incubator_flink_old_spark.sources import load_table

    spark = get_spark("minhash-decomp")
    docs = load_table(spark, sf_dir, "documents")
    # Warm JIT on the family's kernels first (bench warmup discipline).
    minhash_lsh_pairs(docs, band_size=4).write.format("noop").mode(
        "overwrite"
    ).save()

    metrics = StageMetrics(spark)
    metrics.advance()

    def run(label, df, runs=2):
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            eng = metrics.advance()
            row = (
                wall,
                eng["executor_run_time_ms"] / 1e3,
                eng["executor_cpu_time_ns"] / 1e9,
                eng["shuffle_write_bytes"] / 1e6,
                eng["n_stages"],
            )
            if best is None or row[1] < best[1]:
                best = row
        print(
            f"{label:34s} wall {best[0]:6.2f}s  ert {best[1]:6.2f}s  "
            f"cpu {best[2]:6.2f}s  shuf {best[3]:7.1f}MB  stages {best[4]}",
            flush=True,
        )

    key = "doc_id"
    n = docs.count()
    print(f"documents rows: {n}")

    toksets = docs.select(
        F.col(key).alias("__k"),
        _hashed_set(tokens("text", distinct=True)).alias("__toks"),
    )
    run("A tokenize+hashset only", toksets)
    sigs = minhash_signature(docs, 8, "text", key)
    run("B signatures only (8x md5)", sigs)
    bands_old = minhash_bands(docs, 8, 4, "text", key, _toksets=toksets)
    run("C_old bands (sigs JOIN toksets)", bands_old)
    bands = minhash_bands(docs, 8, 4, "text", key)
    run("C_new bands (fused projection)", bands)
    cands_old = (
        bands_old.select(
            F.col(key).alias("doc_a"), F.col("__n").alias("na"), "band", "bucket"
        )
        .join(
            bands_old.select(
                F.col(key).alias("doc_b"), F.col("__n").alias("nb"), "band", "bucket"
            ),
            on=["band", "bucket"],
        )
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.least("na", "nb").cast("double") / F.greatest("na", "nb") >= 0.7)
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    run("D_old candidates (join+distinct)", cands_old)
    cands = band_candidates(bands, 0.7, key=key)
    run("D_new candidates (min-band filter)", cands)
    from incubator_flink_old_spark.operators.text import _jaccard_verify

    pairs_old = _jaccard_verify(cands_old, toksets, toksets, 0.7)
    run("E_old full (D_old + verify)", pairs_old)
    pairs = minhash_lsh_pairs(docs, band_size=4, jaccard_threshold=0.7)
    run("E_new full (D_new + verify)", pairs)
    n_old, n_new = cands_old.count(), cands.count()
    print(f"candidate count old={n_old} new={n_new} equal={n_old == n_new}")
    diff = pairs.select("doc_a", "doc_b").exceptAll(
        pairs_old.select("doc_a", "doc_b")
    ).count() + pairs_old.select("doc_a", "doc_b").exceptAll(
        pairs.select("doc_a", "doc_b")
    ).count()
    print(f"pair count old/new: {pairs_old.count()}/{pairs.count()}  symdiff={diff}")

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
