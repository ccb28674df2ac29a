"""Recall-vs-n_probe sweep for the IVF+SQ8 (+refine) ANN tiers — the
knob the round-7 hybrid sweep isolated: with the dense candidate budget
proven lossless (all-cells recall 1.00 in tools/retrieval_sweep.py),
EVERY remaining recall loss is cell-miss, so n_probe is what a
deployment tunes. This measures recall@5 against the exact grid truth
for n_probe ∈ {1..n_cells} at 1x (sf0.1) and Nx corpus scale, for the
plain code-ranked tier and the full-precision refine tier, plus wall
per cell — pricing both the recall curve and its cost slope.

The measured bodies are IMPORTED from the query modules
(_ivfsq8_recall_df / _ivfsq8_refine_recall_df) — the probe measures the
shipped algorithm. The Nx corpus is written parquet-shaped like an sf
dir so the shared bodies read it through the ordinary t() source.

Usage: python tools/nprobe_sweep.py [N_scale]   (default 16)
Run on a quiet box if the wall numbers are to be quoted.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = (1, 2, 3, 5, 8)


def main() -> None:
    n_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sf_dir = "/root/testdata/sf0.1"

    from incubator_flink_old_spark import get_spark

    spark = get_spark("nprobe-sweep")
    out = tempfile.mkdtemp(prefix="nprobe_sweep_")
    try:
        _sweep(spark, sf_dir, n_scale, out)
    finally:
        spark.stop()
        shutil.rmtree(out, ignore_errors=True)


def _sweep(spark, sf_dir: str, n_scale: int, out: str) -> None:
    from incubator_flink_old_spark.queries.llm_ops11 import (
        _N_CELLS,
        _N_QUERIES,
        _TOPK,
    )
    from incubator_flink_old_spark.queries.llm_ops25 import _ivfsq8_recall_df
    from incubator_flink_old_spark.queries.llm_ops26 import (
        _ivfsq8_refine_recall_df,
    )
    from incubator_flink_old_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    max_id = emb.agg(F.max("vec_id")).first()[0] + 1

    def grow(n):
        # the retrieval_sweep recipe: random-SIGN per-(replica, dim)
        # perturbation keeps replicas distinct without handing one
        # extreme replica the global top-k
        def perturb(i):
            return F.transform(
                "embedding",
                lambda x, p: x
                + F.lit(i * 1e-4)
                * F.when(
                    F.pmod(F.hash(F.lit(i), p), F.lit(2)) == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0)),
            )

        parts = [
            emb.select(
                (F.col("vec_id") + F.lit(i * max_id)).alias("vec_id"),
                perturb(i).alias("embedding"),
                "label",
            )
            for i in range(n)
        ]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        return big

    for scale, n in (("1x", 1), (f"{n_scale}x", n_scale)):
        sdir = os.path.join(out, scale)
        grow(n).write.mode("overwrite").parquet(
            os.path.join(sdir, "embeddings.parquet")
        )
        n_rows = load_table(spark, sdir, "embeddings").count()
        for n_probe in PROBES:
            if n_probe > _N_CELLS:
                continue
            t0 = time.perf_counter()
            plain = sum(
                r.hits
                for r in _ivfsq8_recall_df(
                    spark, sdir, n_probe=n_probe
                ).collect()
            )
            wall_p = time.perf_counter() - t0
            t0 = time.perf_counter()
            ref = sum(
                r.hits
                for r in _ivfsq8_refine_recall_df(
                    spark, sdir, n_probe=n_probe
                ).collect()
            )
            wall_r = time.perf_counter() - t0
            denom = _N_QUERIES * _TOPK
            print(
                f"scale={scale} rows={n_rows:,} n_probe={n_probe}: "
                f"ivfsq8_recall@{_TOPK}={plain / denom:.2f} "
                f"refine_recall@{_TOPK}={ref / denom:.2f} "
                f"wall={wall_p:.2f}s/{wall_r:.2f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
