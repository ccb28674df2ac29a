"""Bucketed-layout probe: materialize the two fact tables bucketed by
their join key and measure a fact⨝fact join both ways.

At 100 TB the single biggest shuffle in the TPC-H-shaped workload is
lineitem⨝orders on orderkey. Writing both tables bucketed by that key
(`bucketBy` + `saveAsTable`) makes the join a zero-exchange zip of
co-located buckets — this tool proves the plan shape locally and prints
the measured wall-clock for both layouts.

Usage: python tools/bucketize.py [sf_dir] [n_buckets]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_BUCKETS = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def main() -> int:
    from pyspark.sql import functions as F

    from incubator_flink_old_spark.session import get_spark
    from incubator_flink_old_spark.sources import load_table

    spark = get_spark("bucketize-probe")
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")

    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # a fresh metastore doesn't know about a stale warehouse dir — clear it
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("b_orders", "b_lineitem"):
        shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
    t0 = time.time()
    (
        orders.write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        li.write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    t_write = time.time() - t0

    def q(o, l):
        return (
            l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(
                F.sum(F.col("l_extendedprice").cast("decimal(27,6)"))
                .cast("double")
                .alias("rev")
            )
        )

    def run(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    plain = q(orders, li)
    bucketed = q(spark.table("b_orders"), spark.table("b_lineitem"))

    # Plan shape: the bucketed join must have ZERO exchanges.
    txt = bucketed._jdf.queryExecution().executedPlan().toString()
    n_exch = txt.count("Exchange")
    # warm both paths once, then measure
    run(plain), run(bucketed)
    t_plain = min(run(plain), run(plain))
    t_bucketed = min(run(bucketed), run(bucketed))
    print(
        f"sf_dir={SF_DIR} buckets={N_BUCKETS} write={t_write:.1f}s | "
        f"join+agg plain={t_plain:.2f}s bucketed={t_bucketed:.2f}s | "
        f"bucketed-plan total exchanges={n_exch} (the agg's, not the "
        f"join's — the join itself is shuffle-free, asserted below)"
    )
    assert "Exchange hashpartitioning(l_orderkey" not in txt, (
        "bucketed join still shuffles lineitem"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
