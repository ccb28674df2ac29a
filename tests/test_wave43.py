"""Round-9 guard laws (ADVICE r08): the frozen-index pure maps and the
latest-wins state worker must fail LOUDLY on malformed index tables /
payload sets instead of silently emitting code=-1 / NULL codes / wrong
schemas — the fail-loudly discipline the empty-list checks established,
extended to partial and mistyped inputs."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")


def test_pq_encode_map_rejects_missing_subspace(spark):
    """A codebook list covering only some subspaces would make the
    missing subspace's literal array empty and its argmin fold emit
    code=-1/qerr=inf silently — must raise instead (ADVICE r08)."""
    from incubator_flink_old_spark.operators.similarity import (
        grid_pq,
        grid_pq_encode_map,
    )
    from incubator_flink_old_spark.queries._util import t
    from incubator_flink_old_spark.queries.llm_ops11 import _PQ_M

    emb = t(spark, SF, "embeddings")
    _, books = grid_pq(emb, m=_PQ_M, n_centroids=4, iters=1)
    partial = [r for r in books.collect() if r.j != 1]
    with pytest.raises(ValueError, match=r"no codebook rows for subspace"):
        grid_pq_encode_map(emb, partial, m=_PQ_M)


def test_sq8_encode_map_rejects_gapped_bounds(spark):
    """A gapped/duplicated bounds table would element_at NULL lo/hi for
    the missing dims and emit silent NULL codes — must raise."""
    from incubator_flink_old_spark.operators.similarity import sq8_encode_map
    from incubator_flink_old_spark.queries._util import t
    from incubator_flink_old_spark.queries.llm_ops18 import (
        _grid_vec,
        _sq_bounds,
    )

    emb = t(spark, SF, "embeddings")
    bounds = _sq_bounds(emb.select("vec_id", _grid_vec().alias("k")))
    gapped = [r for r in bounds.collect() if r.p != 7]
    with pytest.raises(ValueError, match=r"must be exactly 1\.\."):
        sq8_encode_map(emb, gapped)


def test_sq8_encode_map_rejects_short_bounds_at_runtime(spark):
    """A bounds table that is contiguous 1..n but SHORTER than the
    vectors passes the plan-time check; the in-plan raise_error guard
    must fail the job instead of emitting NULL codes past dim n."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from incubator_flink_old_spark.operators.similarity import sq8_encode_map
    from incubator_flink_old_spark.queries._util import t
    from incubator_flink_old_spark.queries.llm_ops18 import (
        _grid_vec,
        _sq_bounds,
    )

    emb = t(spark, SF, "embeddings")
    bounds = _sq_bounds(emb.select("vec_id", _grid_vec().alias("k")))
    short = [r for r in bounds.collect() if r.p <= 16]  # contiguous 1..16
    with pytest.raises(SparkRuntimeException, match="vector dim exceeds"):
        sq8_encode_map(emb, short).collect()


def test_stateful_latest_rejects_unknown_payload(spark):
    from incubator_flink_old_spark.streaming import stateful_latest

    df = spark.createDataFrame(
        [(1, 10, 100, "a", 1.0)],
        "user_id long, ts_us long, event_id long, event_type string, "
        "value double",
    )
    with pytest.raises(ValueError, match="not in the stream schema"):
        stateful_latest(df, payload_cols=("event_type", "nope"))


def test_stateful_latest_derives_payload_types_from_schema(spark):
    """stateful_latest with a NON-default payload set (a long counter
    and a second string) must carry each column's input type verbatim —
    the r08 name-based special case typed anything not named
    'event_type' as double and broke exactly this call shape."""
    from incubator_flink_old_spark.streaming import (
        run_stream_to_memory,
        stateful_latest,
    )

    src = tempfile.mkdtemp(prefix="t2_latest_schema_")
    try:
        spark.createDataFrame(
            [
                (1, 10, 100, "x", 7),
                (1, 20, 101, "y", 8),
                (2, 5, 102, "z", 9),
            ],
            "user_id long, ts_us long, event_id long, tag string, cnt long",
        ).repartition(2).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(
                "user_id long, ts_us long, event_id long, "
                "tag string, cnt long"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        out = stateful_latest(stream, payload_cols=("tag", "cnt"))
        assert dict(out.dtypes)["tag"] == "string"
        assert dict(out.dtypes)["cnt"] == "bigint"
        run_stream_to_memory(out, "latest_schema_law", "update",
                             state_partitions=2)
        rows = {
            r.user_id: (r.ts_us, r.event_id, r.tag, r.cnt)
            for r in spark.table("latest_schema_law")
            .withColumn(
                "mx", F.max("seen").over(Window.partitionBy("user_id"))
            )
            .filter(F.col("seen") == F.col("mx"))
            .collect()
        }
    finally:
        shutil.rmtree(src, ignore_errors=True)
    assert rows == {1: (20, 101, "y", 8), 2: (5, 102, "z", 9)}


def test_regression_scan_skips_malformed_entry(tmp_path):
    """A sidecar entry with no usable run values must be skipped with a
    warning, not abort the scan that gates round close (ADVICE r08);
    and the OLD argument accepts a comma-separated list so the
    denominator is min-of-all-old-sidecars (symmetric with NEW)."""
    old1 = tmp_path / "old1.json"
    old1.write_text(json.dumps({"engine_metrics": {
        "q_a": {"runs_engine_ms": [2000, 1500]},
        "q_bad": {},  # malformed: no runs at all
    }}))
    old2 = tmp_path / "old2.json"
    old2.write_text(json.dumps({"engine_metrics": {
        "q_a": {"runs_engine_ms": [1000]},
    }}))
    new = tmp_path / "new.json"
    new.write_text(json.dumps({"engine_metrics": {
        "q_a": {"runs_engine_ms": [1100]},
        "q_bad": {"runs_engine_ms": [500]},
    }}))
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "regression_scan.py"),
         f"{old1},{old2}", str(new)],
        capture_output=True, text=True,
    )
    # q_a: old min = 1.0s (from old2), new 1.1s -> no hit; q_bad skipped
    # on the old side (warning), so not shared. rc 0, one WARN line.
    assert r.returncode == 0, r.stdout + r.stderr
    assert "WARN" in r.stderr and "q_bad" in r.stderr
    assert "1 shared queries" in r.stdout
    assert "zero >1.5x/+1s hits" in r.stdout
