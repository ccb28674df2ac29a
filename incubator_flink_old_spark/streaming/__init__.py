"""Event-time & streaming extension (SURVEY §2.10 W1–W6).

The reference tree is the batch-only Stratosphere era: no watermarks, no
windows, no user-facing state (execution pipelines records through Nephele
channels, but the programming model is bounded DataSets). Per the project
north star these capabilities are engine extensions built on Structured
Streaming — and every window operator below is defined so the SAME
function works on a batch DataFrame (driver-checkable against SQL) and on
a streaming DataFrame (readStream + watermark), which is Spark's
batch/stream unification doing the work.

Scale posture: windowed aggregations are keyed-state operators; the state
store partitions by (key, window). Watermarks bound state size — an
unbounded-lateness stream at 100TB/day would otherwise accrete state
forever, so ``with_watermark`` is mandatory in the streaming forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """W4: bound event-time lateness; late rows beyond ``delay`` drop out
    of stateful operators and their state is reclaimed."""
    return df.withWatermark(ts_col, delay)


def _windowed(df: DataFrame, window_col: Column, keys: list[str], aggs: tuple[Column, ...]) -> DataFrame:
    out = df.groupBy(window_col.alias("_w"), *keys).agg(*aggs)
    agg_cols = out.columns[1 + len(keys):]
    return out.select(
        F.col("_w.start").alias("win_start"),
        F.col("_w.end").alias("win_end"),
        *keys,
        *agg_cols,
    )


def tumbling_window(
    df: DataFrame, ts_col: str, duration: str, keys: list[str], *aggs: Column
) -> DataFrame:
    """W1: fixed non-overlapping windows. Output carries win_start/win_end
    (epoch-aligned, matching SQL time_bucket semantics)."""
    return _windowed(df, F.window(ts_col, duration), keys, aggs)


def sliding_window(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    *aggs: Column,
) -> DataFrame:
    """W2: overlapping windows — each row contributes to duration/slide
    windows (Spark expands rows internally; state cost multiplies
    accordingly, size watermarks to match)."""
    return _windowed(df, F.window(ts_col, duration, slide), keys, aggs)


def session_window(
    df: DataFrame, ts_col: str, gap: str, keys: list[str], *aggs: Column
) -> DataFrame:
    """W3: data-driven windows — a session closes after ``gap`` of
    inactivity; window end = last event + gap. Batch and streaming forms
    share this exact definition (gaps-and-islands in SQL terms)."""
    return _windowed(df, F.session_window(ts_col, gap), keys, aggs)


def dedup_keep_first(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """W5 batch form: deterministic dedup — keep the first row per key in
    the given (fully tie-broken) event order."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_streaming(df: DataFrame, keys: list[str], ts_col: str, delay: str) -> DataFrame:
    """W5 streaming form: state-backed exactly-once-per-key emission within
    the watermark horizon (state reclaimed past it)."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-replay streaming source over the events fixture (the same
    parquet the batch forms read, replayed file-at-a-time).

    The events parquet stores TIMESTAMP(NANOS); streaming reads it as long
    nanos (same legacy conf as batch) and normalizes to µs timestamps.
    """
    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        # file streaming sources take a directory; filter to the events file
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def run_stream_to_memory(stream_df: DataFrame, query_name: str, output_mode: str):
    """Drive a bounded streaming query to completion synchronously
    (memory sink; for tests/smoke — production sinks are files/kafka via
    writeStream with checkpointLocation)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
