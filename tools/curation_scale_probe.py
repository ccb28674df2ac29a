"""Curation-path scale probe: replicate the sf0.1 documents 4× (key-shifted
so replicas are distinct docs with identical text bodies) and compare each
linear curation operator's wall clock against 1×. The claim under test:
these operators scale with input bytes — no accidental O(n²), no
driver-side collectors, no per-doc jobs.

MinHash/cluster dedup is deliberately absent here: replicating a near-dup
corpus k× multiplies TRUE pair volume ~k², which is data-inherent output
growth, not operator overhead (PERF.md covers it).

Usage: python tools/curation_scale_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from incubator_flink_old_spark.operators.similarity import quantize_embeddings
from incubator_flink_old_spark.operators.text import (
    decontaminate,
    exact_dedup,
    repetition_metrics,
    text_stats,
)
from incubator_flink_old_spark.session import prep_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPL = 4


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    prep_session(spark)

    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs1.count()
    docsk = docs1
    for i in range(1, REPL):
        docsk = docsk.union(
            docs1.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    emb1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    embk = emb1
    for i in range(1, REPL):
        embk = embk.union(emb1.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000)))

    def probe(label, make):
        out = {}
        for tag, df in (("1x", make(docs1, emb1)), (f"{REPL}x", make(docsk, embk))):
            df.write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            out[tag] = round(time.perf_counter() - t0, 2)
        ratio = round(out[f"{REPL}x"] / max(out["1x"], 1e-9), 1)
        print(f"{label}: 1x={out['1x']}s {REPL}x={out[f'{REPL}x']}s ratio={ratio}")

    probe("text_stats", lambda d, e: text_stats(d))
    probe("exact_dedup", lambda d, e: exact_dedup(d))
    probe("repetition_metrics", lambda d, e: repetition_metrics(d))
    probe(
        "decontaminate",
        lambda d, e: decontaminate(d, d.filter(F.col("doc_id") % 97 == 0)),
    )
    probe("quantize_embeddings", lambda d, e: quantize_embeddings(e))
    print(f"(n_docs 1x = {n})")
    spark.stop()


if __name__ == "__main__":
    main()
