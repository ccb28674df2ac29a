"""Query-batch scaling probe for bm25_multi_topk (round 9): the
operator's 100 TB claim is that an index evaluation AMORTIZES — the
corpus tokenizes once per job, so eval cost grows with the query batch,
not queries × corpus. Measure it: wall time for batches of 5 / 50 / 500
deterministic synthetic term sets at sf0.1, per-batch and per-query.

Query sets are 3-term combinations of the fixture's 31-token vocabulary
in a fixed enumeration order — deterministic, no RNG.

Usage: python tools/mq_eval_probe.py [SF_DIR]   (quiet box if quoted)
"""

from __future__ import annotations

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from incubator_flink_old_spark import get_spark
    from incubator_flink_old_spark.operators.retrieval import bm25_multi_topk
    from incubator_flink_old_spark.operators.text import tokens
    from incubator_flink_old_spark.sources import load_table, local_rows

    spark = get_spark("mq-eval-probe")
    docs = load_table(spark, sf_dir, "documents").localCheckpoint(eager=True)
    vocab = sorted(
        r.w
        for r in docs.select(F.explode(tokens("text")).alias("w"))
        .select("w")
        .distinct()
        .collect()
    )
    combos = itertools.combinations(vocab, 3)
    all_queries = [(i, list(ts)) for i, ts in enumerate(
        itertools.islice(combos, 500)
    )]

    # warm (JVM + plan shapes) so the sweep measures steady state
    warm = local_rows(
        spark, all_queries[:2], "q_id bigint, terms array<string>"
    )
    bm25_multi_topk(docs, warm).write.format("noop").mode("overwrite").save()

    for n in (5, 50, 500):
        q = local_rows(
            spark, all_queries[:n], "q_id bigint, terms array<string>"
        )
        t0 = time.perf_counter()
        bm25_multi_topk(docs, q).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        print(
            f"batch={n:4d}  wall={dt:6.2f}s  per-query={dt / n * 1000:7.1f}ms",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
