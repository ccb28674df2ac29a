"""Training-data pipeline queries, wave 27: driver rows for the two
streaming surfaces that were pytest-only (SpaceSaving heavy hitters,
exactly-once sink), plus the cluster-aware leakage-safe split.

SURVEY §2.10 parity discipline: the streaming operator runs as a REAL
multi-batch stream (file replay, one file per microbatch) and the oracle
is plain batch SQL over the same rows — Spark's batch/stream unification
is the thing under test, so any state-handling bug (lost counters on
eviction, double-applied batches, non-idempotent retries) breaks the
hash.
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import split_case_sql, split_col, t
from incubator_flink_old_spark.queries.llm_ops2 import _dedup_cluster_oracle

_SEQ = itertools.count()

# --------------------------------------------------------------------------
# Streaming SpaceSaving heavy hitters ⇄ exact batch counts
# --------------------------------------------------------------------------
#: Counter budget of the parity row. Far above the fixtures' distinct
#: user count per event_type (150 at sf0.01, ~1.5k at sf0.1), so the
#: SpaceSaving summary never evicts and its counts are EXACT — the
#: regime where streaming output must equal a plain batch groupBy count.
_HH_CAPACITY = 8192
_HH_TOPK = 5

_HH_ORACLE = f"""
    WITH c AS (
        SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2),
    r AS (
        SELECT event_type, user_id, cnt,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY cnt DESC, user_id
               ) AS rnk
        FROM c)
    SELECT event_type, user_id, cnt, CAST(0 AS BIGINT) AS err,
           CAST(rnk AS INT) AS rnk
    FROM r WHERE rnk <= {_HH_TOPK}
    """


@register("q_stream_hh_parity", oracle=_HH_ORACLE)
def q_stream_hh_parity(spark, sf_dir):
    """Streaming SpaceSaving heavy hitters ⇄ batch parity — the bounded-
    state frequency operator (streaming.stateful_heavy_hitters) gets an
    oracle-checked driver row, upgrading it from pytest-only coverage.
    The events land as FOUR parquet files replayed one file per
    microbatch, so per-group counters genuinely merge across batches
    through the state store. With capacity ≥ distinct values the summary
    is exact (err 0); each batch emits its full counter set, and since
    counts only grow, MAX(cnt) per (group, value) over all emissions IS
    the final count — a partition- and batch-boundary-invariant readback
    (the same monotonicity SpaceSaving's guarantee rests on). The batch
    side re-ranks top-5 with the operator's own tie-break (cnt desc,
    value string asc). At 100 TB/day the same operator runs with
    capacity << distinct values and err reports the eviction bound;
    exactness here pins the merge logic that regime reuses.
    Scale: state is O(capacity) per group forever; emissions are
    capacity-bounded rows per group per batch."""
    from incubator_flink_old_spark.streaming import (
        run_stream_to_memory,
        stateful_heavy_hitters,
    )

    src = tempfile.mkdtemp(prefix="t2_hh_src_")
    (
        t(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .repartition(4)
        .write.mode("overwrite")
        .parquet(src)
    )
    stream = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stateful_heavy_hitters(
        stream, capacity=_HH_CAPACITY, k=_HH_CAPACITY,
        group="event_type", value="user_id",
    )
    name = f"stream_hh_{next(_SEQ)}"
    run_stream_to_memory(out, name, "update", state_partitions=4)
    final = (
        spark.table(name)
        .groupBy("event_type", "user_id")
        .agg(F.max("cnt").alias("cnt"), F.max("err").alias("err"))
    )
    w = Window.partitionBy("event_type").orderBy(F.col("cnt").desc(), "user_id")
    return (
        final.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _HH_TOPK)
        .select("event_type", "user_id", "cnt", "err", "rnk")
    )


# --------------------------------------------------------------------------
# Exactly-once file sink ⇄ source identity under a forced duplicate retry
# --------------------------------------------------------------------------
_EOS_ORACLE = """
    SELECT event_id, user_id, event_type, value,
           CAST(epoch(ts) AS DOUBLE) AS ep
    FROM events
    """


@register("q_stream_eos_sink_parity", oracle=_EOS_ORACLE)
def q_stream_eos_sink_parity(spark, sf_dir):
    """Exactly-once file sink ⇄ source identity — the foreachBatch
    idempotent-commit protocol (streaming.idempotent_parquet_sink) gets
    an oracle-checked driver row. The events replay as a three-file
    stream into the sink, then a DUPLICATE DELIVERY of batch_id=0 is
    forced with a poisoned payload (the FULL dataset — ~3× batch 0): a
    sink without the committed-marker check would overwrite the batch
    directory and the readback hash would explode. read_committed sees
    each epoch exactly once, so the committed union must be EXACTLY the
    source rows — byte-identical values, since both engines read the
    same parquet and the only computed column (ep) is the established
    micros/1e6 double-epoch parity. This is the recovery semantics
    Structured Streaming actually exercises: after a failure the same
    batch_id is retried with the same (or here, adversarially wrong)
    data, and output must not duplicate. Scale: one rename-free
    overwrite + marker per epoch; readers trust only marked dirs."""
    from incubator_flink_old_spark.streaming import (
        idempotent_parquet_sink,
        read_committed,
    )

    base = tempfile.mkdtemp(prefix="t2_eos_")
    src = os.path.join(base, "src")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    full = (
        t(spark, sf_dir, "events")
        .select(
            "event_id", "user_id", "event_type", "value",
            F.col("ts").cast("timestamp").cast("double").alias("ep"),
        )
    )
    full.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, "
            "value double, ep double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sink = idempotent_parquet_sink(out)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # forced duplicate delivery of a committed epoch with a poisoned
    # payload — the no-op proves idempotence, not absence of retries
    sink(full, 0)
    return read_committed(spark, out).select(
        "event_id", "user_id", "event_type", "value", "ep"
    )


# --------------------------------------------------------------------------
# Cluster-aware leakage-safe split (near-dups never straddle splits)
# --------------------------------------------------------------------------
def _cluster_split_oracle() -> str:
    return f"""
    WITH base AS ({_dedup_cluster_oracle()})
    SELECT doc_id, cluster_id,
           {split_case_sql("cluster_id")} AS split
    FROM base
    """


@register("q_cluster_safe_split", oracle=_cluster_split_oracle())
def q_cluster_safe_split(spark, sf_dir):
    """Leakage-safe train/val/test split: the md5-Bernoulli 80/10/10
    assignment keyed by the NEAR-DUP CLUSTER id instead of the doc id —
    every member of a MinHash cluster lands in the same split by
    construction, so a near-duplicate of a training document can never
    contaminate val/test (the failure q_split_leakage AUDITS, prevented
    at assignment time; group-aware splitting is the standard
    decontamination-safe recipe). Composition of two shipped primitives:
    dedup_clusters (LSH pairs → connected components) and the single-
    source split law (_util.split_col ⇄ split_case_sql), so the split
    stays a stable property of cluster membership across runs, engines
    and partitionings. Scale: the cluster pass is the proven banded
    layout; the assignment itself is map-side on its output."""
    from incubator_flink_old_spark.operators.text import dedup_clusters

    docs = t(spark, sf_dir, "documents")
    clusters = dedup_clusters(docs, band_size=4).select("doc_id", "cluster_id")
    return clusters.select(
        "doc_id", "cluster_id", split_col("cluster_id").alias("split")
    )
