"""Beyond-sf0.1 scale probe for the round-4 text/retrieval operators:
synthesize an N× documents/events copy in /tmp by unioning key-shifted
replicas and check that BM25, bigram-LM scoring, count-min and the
event-log EWMA scale ~linearly (their cost models are token-volume /
event-volume linear: vocabulary-sized count tables, broadcast dims, no
pair joins — replica text is identical, which is exactly the worst case
for vocabulary skew since every count concentrates on one vocab).

Usage: python tools/scale_probe_text.py [N]
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
    from incubator_flink_old_spark.operators.retrieval import (
        bigram_lm_scores,
        bm25_topk,
    )
    from incubator_flink_old_spark.operators.sketches import count_min_estimates
    from incubator_flink_old_spark.operators.text import tokens
    from incubator_flink_old_spark.sources import load_table

    spark = get_spark("scale-probe-text")
    out = tempfile.mkdtemp(prefix="scale_probe_text_")

    docs = load_table(spark, sf_dir, "documents")
    max_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * max_doc))
        for i in range(n)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    # write BOTH scales through the same rewrite path so the ratio
    # measures data volume, not codec/row-group layout differences
    # between the fixture parquet and a fresh rewrite
    docs.write.mode("overwrite").parquet(f"{out}/documents_1x")
    big.write.mode("overwrite").parquet(f"{out}/documents_{n}x")
    base_docs = spark.read.parquet(f"{out}/documents_1x")
    big_docs = spark.read.parquet(f"{out}/documents_{n}x")
    print(f"scaled documents rows: {big_docs.count():,} (N={n})")

    def run(label, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.perf_counter() - t0:.2f}s", flush=True)

    try:
        for scale, d in (("1x", base_docs), (f"{n}x", big_docs)):
            run(f"bm25_{scale}", bm25_topk(d, terms=("hash", "join", "scan")))
            run(f"bigram_lm_{scale}", bigram_lm_scores(d))
            run(
                f"count_min_{scale}",
                count_min_estimates(
                    d.select(F.explode(tokens("text")).alias("w"))
                ),
            )
    finally:
        spark.stop()
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
