"""Beyond-sf0.1 scale probe: synthesize an N× lineitem/orders copy in
/tmp by unioning key-shifted replicas (~5M lineitem rows at N=8) and run
the headline relational queries, checking wall-clock scales ~linearly and
no plan cliffs appear (spills, single-task stages).

Usage: python tools/scale_probe.py [N]
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

    spark = get_spark("scale-probe")
    out = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        _probe(spark, sf_dir, n, out)
    finally:
        # the Nx replicas must not accumulate in /tmp, success or not
        spark.stop()
        shutil.rmtree(out, ignore_errors=True)


def _probe(spark, sf_dir: str, n: int, out: str) -> None:
    from pyspark.sql import functions as F  # noqa: F811

    from incubator_flink_old_spark.queries._util import dsum
    from incubator_flink_old_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    max_ok = orders.agg(F.max("o_orderkey")).first()[0] + 1

    def replicate(df, keycols):
        parts = []
        for i in range(n):
            d = df
            for kc in keycols:
                d = d.withColumn(kc, F.col(kc) + F.lit(i * max_ok))
            parts.append(d)
        out_df = parts[0]
        for p in parts[1:]:
            out_df = out_df.unionByName(p)
        return out_df

    replicate(li, ["l_orderkey"]).write.mode("overwrite").parquet(f"{out}/lineitem")
    replicate(orders, ["o_orderkey"]).write.mode("overwrite").parquet(f"{out}/orders")
    big_li = spark.read.parquet(f"{out}/lineitem")
    big_orders = spark.read.parquet(f"{out}/orders")
    print(f"scaled lineitem rows: {big_li.count():,} (N={n})")

    timings = {}
    t0 = time.perf_counter()
    (
        big_li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base"),
            F.count(F.lit(1)).alias("n"),
        )
        .write.format("noop").mode("overwrite").save()
    )
    timings["q1_style_agg"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    (
        big_li.join(big_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "rev"))
        .write.format("noop").mode("overwrite").save()
    )
    timings["fact_fact_join_agg"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    (
        big_li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
        .write.format("noop").mode("overwrite").save()
    )
    timings["topk"] = round(time.perf_counter() - t0, 2)

    print(timings)


if __name__ == "__main__":
    main()
