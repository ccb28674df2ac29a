"""Beyond-sf0.1 scale probe for the round-5 ANN/retrieval tiers: grow
the embeddings corpus N× (key-shifted replicas with a deterministic
per-replica grid perturbation so vectors are distinct) and measure

- SQ8 encode + top-k code scan (q_ann_recall_sq8's shape): expected
  ~linear in corpus size — the (lo,hi) table is a 64-row broadcast, the
  encode is map-only, and the query-side scan is |queries| × n, not n²;
- two-stage retrieval (q_retrieval_two_stage's shape over an N×
  documents copy): expected ~linear — BM25's count tables are
  vocabulary/doc-keyed, the rerank stays O(candidates).

Usage: python tools/scale_probe_ann.py [N]   (default 8)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = "/root/testdata/sf0.1"

    from incubator_flink_old_spark import get_spark
    from incubator_flink_old_spark.operators.retrieval import bm25_topk
    from incubator_flink_old_spark.operators.similarity import grid_sqdist
    from incubator_flink_old_spark.sources import load_table

    spark = get_spark("scale-probe-ann")
    out = tempfile.mkdtemp(prefix="scale_probe_ann_")

    emb = load_table(spark, sf_dir, "embeddings")
    max_id = emb.agg(F.max("vec_id")).first()[0] + 1
    reps = [
        emb.select(
            (F.col("vec_id") + F.lit(i * max_id)).alias("vec_id"),
            # per-replica perturbation keeps vectors distinct without
            # changing the value distribution the quantizer sees
            F.transform(
                "embedding", lambda x: x + F.lit(i * 1e-4)
            ).alias("embedding"),
            "label",
        )
        for i in range(n)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    emb.select("vec_id", "embedding", "label").write.mode("overwrite").parquet(
        f"{out}/emb_1x"
    )
    big.write.mode("overwrite").parquet(f"{out}/emb_{n}x")
    e1 = spark.read.parquet(f"{out}/emb_1x")
    eN = spark.read.parquet(f"{out}/emb_{n}x")
    print(f"scaled embeddings rows: {eN.count():,} (N={n})", flush=True)

    # The quantizer is IMPORTED from the query module, not re-derived:
    # a probe measuring a different algorithm than the shipped query
    # would make the PERF.md scale claims unfalsifiable.
    from incubator_flink_old_spark.queries.llm_ops18 import (
        _grid_vec,
        _SQ_LEVELS,
    )

    def sq8_topk(df):
        eg = df.select("vec_id", _grid_vec().alias("k"))
        dims = eg.select(
            "vec_id", F.posexplode("k").alias("p", "v")
        )
        mm = dims.groupBy("p").agg(
            F.min("v").alias("lo"), F.max("v").alias("hi")
        )
        codes = (
            dims.join(F.broadcast(mm), on="p")
            .select(
                "vec_id",
                "p",
                F.when(F.col("hi") == F.col("lo"), F.lit(0))
                .otherwise(F.expr(f"(v - lo) * {_SQ_LEVELS} div (hi - lo)"))
                .alias("c"),
            )
            .groupBy("vec_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "c"))),
                    lambda s: s.getField("c").cast("double"),
                ).alias("code")
            )
        )
        q = codes.filter(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("q_id"), F.col("code").alias("qc")
        )
        d = q.crossJoin(codes.select("vec_id", F.col("code").alias("cc")))
        from pyspark.sql import Window

        w = Window.partitionBy("q_id").orderBy("d", "vec_id")
        return (
            d.select(
                "q_id", "vec_id", grid_sqdist(F.col("qc"), F.col("cc")).alias("d")
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
        )

    def run(label, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.perf_counter() - t0:.2f}s", flush=True)

    docs = load_table(spark, sf_dir, "documents")
    max_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    dparts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * max_doc))
        for i in range(n)
    ]
    dbig = dparts[0]
    for p in dparts[1:]:
        dbig = dbig.unionByName(p)
    docs.write.mode("overwrite").parquet(f"{out}/docs_1x")
    dbig.write.mode("overwrite").parquet(f"{out}/docs_{n}x")
    d1 = spark.read.parquet(f"{out}/docs_1x")
    dN = spark.read.parquet(f"{out}/docs_{n}x")

    try:
        for scale, e in (("1x", e1), (f"{n}x", eN)):
            run(f"sq8_encode_topk_{scale}", sq8_topk(e))
        for scale, d in (("1x", d1), (f"{n}x", dN)):
            # candidate stage only: the rerank is O(candidates) and
            # scale-free by construction
            run(f"bm25_top50_{scale}", bm25_topk(d, terms=("hash", "join", "scan"), top_k=50))
    finally:
        spark.stop()
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
