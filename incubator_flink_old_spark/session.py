"""SparkSession bootstrap with 100TB-scale-minded defaults.

The reference ships its own execution stack (Nephele JobManager/TaskManager,
managed memory, pipelined channels — SURVEY.md §3/§4.2). In this engine all
of that is Spark's job; the engine's responsibility is to configure Spark
well and keep every operator expressible to Catalyst.

Scale posture (tested on local[N], designed for a 1000-executor cluster):
- AQE on: runtime coalescing, skew-join splitting, dynamic join strategy.
- Broadcast threshold generous enough that TPC-H-style dimension tables
  (region/nation/supplier/part/customer) broadcast instead of shuffling.
- Arrow enabled so the unavoidable pandas-UDF paths batch efficiently.
- Session timezone pinned to UTC so timestamp semantics are engine-stable
  (and comparable against external oracles reading the same parquet).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs applied to ANY session the engine is handed
#: (the test/bench harness builds its own session; so does the driver).
#: Only runtime-mutable keys belong here.
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Dimension tables up to ~64MB broadcast; avoids shuffling the fact side.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # ANSI off: engine keeps permissive null-on-overflow semantics like the
    # reference's Java arithmetic (no query-killing on bad rows at 100TB).
    "spark.sql.ansi.enabled": "false",
    # The events fixture stores TIMESTAMP(NANOS); Spark rejects it natively.
    # Read as long nanos, normalized to µs timestamps in sources.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def prep_session(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply the engine's runtime configuration to an existing session.

    Idempotent and cheap; every public query entry point calls this so the
    engine behaves identically under the driver's session, pytest's session
    and bench's session.
    """
    for key, value in RUNTIME_CONF.items():
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - non-mutable key on some builds
            pass
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark


def get_spark(app_name: str = "incubator_flink_old_spark") -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    local[$SPARK_GRAFT_CPUS] by default; on a real cluster the same code
    runs under spark-submit with master/memory provided externally.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # UI off by default (saves a jetty server + listener overhead in tests);
    # bench sets SPARK_GRAFT_UI=1 to read per-stage engine metrics
    # (executorRunTime, shuffle bytes) back over the UI REST API.
    ui = os.environ.get("SPARK_GRAFT_UI", "") not in ("", "0")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "true" if ui else "false")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
        # A long-lived session compiles one whole-stage-codegen module per
        # stage per query; at the default 240 MB the JVM code cache fills
        # after ~100 queries, HotSpot stops JIT-compiling, and hot verify
        # loops drop to the interpreter (measured 2-4× wall / ~40× CPU on
        # the dedup queries mid-bench). 1 GB + explicit flushing kept
        # steady-state JIT'd for a 125-query session; at 223 registered
        # queries the sweeper starts evicting mid-bench again (round-5
        # recurrence: q_dedup_cluster 28 → 220 CPU-s on an identical
        # plan, flat GC, roaming between family members) — 2 GB restores
        # headroom proportional to the doubled query count. At 242
        # queries the same signature reappeared one size smaller (small
        # queries 2-6× CPU, flat GC, both bench runs expensive:
        # q_data_card 0.4 → 2.4 CPU-s, q_curation_audit 2.5 → 12.2).
        # 2 GB is the JVM HARD MAX for this flag ("Must be at most
        # 2048M"), so past ~230 queries the fix moves to the bench
        # harness: bench.py runs the registry in session CHUNKS sized
        # to the cache (one JVM cannot JIT-hold 242 queries of codegen
        # modules; a real deployment is a session per job anyway).
        # DontCompileHugeMethods is OFF because whole-stage codegen for the
        # pair-verify stages (signature md5s + banded join + intersect)
        # emits methods past HotSpot's 8000-bytecode-byte compile limit;
        # with the default, those exact hot loops silently stay interpreted
        # — measured as 2-5× run-to-run swings on an IDENTICAL plan
        # (16 s vs 32 s for q_dedup_minhash at sf0.1) depending on where
        # method boundaries landed. In local mode executors share this JVM,
        # so the one flag covers the whole engine.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=2g -XX:+UseCodeCacheFlushing "
            "-XX:-DontCompileHugeMethods",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return prep_session(spark, shuffle_partitions=int(cpus))
