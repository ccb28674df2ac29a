"""Skew-join probe: measure a power-law-skewed fact⨝fact join under
(a) AQE skew splitting (the engine's default) and (b) explicit salting
(operators/joins.salted_join), against AQE disabled as the control.

The classic 100 TB failure mode is one reducer pinned on a hot key while
999 idle. This tool builds a deliberately skewed left side (half of all
rows on ONE key), joins it to a uniform right side, and prints the three
wall-clocks plus whether AQE actually reports a skew split.

Usage: python tools/skew_probe.py [n_rows] [salt]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
SALT = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main() -> int:
    from pyspark.sql import functions as F

    from incubator_flink_old_spark.operators.joins import salted_join
    from incubator_flink_old_spark.session import get_spark

    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # Make the skew visible to AQE at this toy size.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ

    # left: half the rows share key 0, rest uniform over 10k keys
    left = spark.range(N).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id") % 10_000)
        .alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )
    right = spark.range(10_000).select(
        F.col("id").alias("rk"), (F.col("id") % 97).alias("w")
    )

    def agg(df):
        return df.groupBy().agg(F.sum("v").alias("sv"), F.sum("w").alias("sw"))

    def run(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    plain = agg(left.join(right, F.col("k") == F.col("rk")))
    salted = agg(salted_join(left, right, "k", "rk", salt=SALT))

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    run(plain)  # warm
    t_noaqe = min(run(plain), run(plain))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    t_aqe = min(run(plain), run(plain))
    t_salted = min(run(salted), run(salted))

    print(
        f"n={N} hot-key-share=50% | SMJ no-AQE={t_noaqe:.2f}s "
        f"AQE={t_aqe:.2f}s salted(x{SALT})={t_salted:.2f}s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
