"""Band-bucketed layout probe for the MinHash candidate join.

PERF.md's 100 TB posture for near-dup search says: write the LSH band
rows bucketed by their join key so the candidate self-join is a
zero-exchange zip instead of the workload's biggest shuffle. This tool
proves it locally: materialize `minhash_bands` output plain vs
`bucketBy(N, band, bucket)`, run the candidate join both ways, assert
the bucketed plan contains no Exchange, and print both wall clocks.

Usage: python tools/band_bucket_probe.py [sf_dir] [n_buckets]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_BUCKETS = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def candidate_join(bands):
    from pyspark.sql import functions as F

    left = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("__n").alias("na"), "band", "bucket"
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("__n").alias("nb"), "band", "bucket"
    )
    return (
        left.join(right, on=["band", "bucket"])
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.least("na", "nb").cast("double") / F.greatest("na", "nb") >= 0.7)
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def main() -> int:
    from incubator_flink_old_spark.operators.text import minhash_bands
    from incubator_flink_old_spark.session import get_spark

    spark = get_spark("band-bucket-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # Model the 100 TB regime: a band table too big to broadcast. Without
    # this the toy-scale table broadcasts and bucketing is moot.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bands = minhash_bands(docs, num_hashes=8, band_size=4)

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("bands_plain", "bands_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(wh, name), ignore_errors=True)

    bands.write.mode("overwrite").saveAsTable("bands_plain")
    (
        bands.write.bucketBy(N_BUCKETS, "band", "bucket")
        .sortBy("band", "bucket")
        .mode("overwrite")
        .saveAsTable("bands_bucketed")
    )

    results = {}
    for name in ("bands_plain", "bands_bucketed"):
        q = candidate_join(spark.table(name))
        plan = q._jdf.queryExecution().executedPlan().toString()
        # the distinct still exchanges on (doc_a, doc_b); the JOIN itself
        # must be exchange-free in the bucketed layout. Count only real
        # shuffle exchanges (ReusedExchange references don't shuffle).
        n_exchange = sum(
            1
            for line in plan.splitlines()
            if "Exchange hashpartitioning" in line and "ReusedExchange" not in line
        )
        q.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        q.write.format("noop").mode("overwrite").save()
        results[name] = (round(time.perf_counter() - t0, 2), n_exchange)
        print(f"{name}: join+distinct {results[name][0]}s, exchanges in plan: {n_exchange}")

    plain_x, bucketed_x = results["bands_plain"][1], results["bands_bucketed"][1]
    assert bucketed_x < plain_x, (
        f"bucketed layout should remove join exchanges ({bucketed_x} vs {plain_x})"
    )
    print("OK: bucketed layout removes the candidate-join shuffle")
    return 0


if __name__ == "__main__":
    sys.exit(main())
