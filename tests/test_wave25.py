"""Wave-25 surfaces: incremental z-order layout maintenance (append
runs + compaction). The oracle gate value-checks q_zorder_incremental
like every registered query; these tests pin the maintenance laws the
hash can't see — probe invariance across base / base+delta / compacted
layouts, delta runs being clustered too, and the compacted layout
restoring the base file count."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _events(spark):
    from incubator_flink_old_spark.sources import load_table

    return load_table(spark, SF, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        "event_type",
        "value",
    )


@pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")
def test_probe_invariant_across_layout_generations(spark):
    """The same rectangle aggregate must be value-identical on (a) the
    base+delta run directory and (b) the compacted rewrite — layouts
    permute rows, never change them."""
    from incubator_flink_old_spark.operators.layout import (
        append_zordered,
        compact_zordered,
        write_zordered,
    )

    ev = _events(spark)
    minu, maxu, mint, maxt = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("t_us"), F.max("t_us")
    ).collect()[0]
    dims = [(F.col("user_id"), minu, maxu), (F.col("t_us"), mint, maxt)]
    base_dir = tempfile.mkdtemp(prefix="t2_w25_") + "/layout"
    comp_dir = tempfile.mkdtemp(prefix="t2_w25_") + "/compacted"
    write_zordered(
        ev.filter(F.pmod("event_id", F.lit(10)) < 8), base_dir, dims,
        n_files=8,
    )
    append_zordered(
        ev.filter(F.pmod("event_id", F.lit(10)) >= 8), base_dir, dims,
        n_files=2,
    )
    compact_zordered(spark, base_dir, comp_dir, dims, n_files=8)

    def agg(path):
        df = spark.read.parquet(path)
        return sorted(
            map(
                tuple,
                df.filter(
                    (F.col("user_id") >= minu + (maxu - minu) * 2 // 10)
                    & (F.col("user_id") <= minu + (maxu - minu) * 5 // 10)
                    & (F.col("t_us") >= mint + (maxt - mint) * 3 // 10)
                    & (F.col("t_us") <= mint + (maxt - mint) * 6 // 10)
                )
                .groupBy("event_type")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("value").cast("decimal(27,6)")).alias("tv"),
                )
                .collect(),
            )
        )

    assert agg(base_dir) == agg(comp_dir)
    # full-table row counts equal too (no loss/dup across runs)
    assert (
        spark.read.parquet(base_dir).count()
        == spark.read.parquet(comp_dir).count()
        == ev.count()
    )
    # compaction restores the configured file count; base+delta had more
    assert len(glob.glob(comp_dir + "/*.parquet")) <= len(
        glob.glob(base_dir + "/*.parquet")
    )


@pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")
def test_delta_runs_are_clustered_too(spark):
    """Appended delta files must carry tight per-dim min/max like the
    base (same dims + grid bounds), or probes over fresh data would
    stop pruning between compactions."""
    from incubator_flink_old_spark.operators.layout import append_zordered

    ev = _events(spark)
    minu, maxu, mint, maxt = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("t_us"), F.max("t_us")
    ).collect()[0]
    dims = [(F.col("user_id"), minu, maxu), (F.col("t_us"), mint, maxt)]
    d = tempfile.mkdtemp(prefix="t2_w25_") + "/delta_only"
    append_zordered(ev, d, dims, n_files=8)
    stored = spark.read.parquet(d)
    gu = max(maxu - minu, 1)
    per_file = (
        stored.withColumn("__f", F.input_file_name())
        .groupBy("__f")
        .agg(F.min("user_id").alias("ul"), F.max("user_id").alias("uh"))
        .collect()
    )
    assert len(per_file) >= 4
    mean_u = sum((r.uh - r.ul) / gu for r in per_file) / len(per_file)
    assert mean_u < 0.6, f"delta run not clustered: {mean_u:.3f}"
