"""Custom stateful streaming operator (applyInPandasWithState) — the
engine's extension point for operators built-ins can't express."""

from __future__ import annotations

from incubator_flink_old_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    stateful_session_stats,
)


def test_stateful_session_stats_stream(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    out = stateful_session_stats(stream, gap_seconds=300)
    run_stream_to_memory(out, "stateful_sessions", "append")
    rows = spark.sql("SELECT * FROM stateful_sessions").collect()
    # sessions close mid-stream (gap) — the fixture has inter-event gaps
    # well above 300s per user, so some closed sessions must be emitted
    assert rows, "expected closed sessions from the replayed fixture"
    for r in rows:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1
        dur = r["session_end"] - r["session_start"]
        assert dur <= 3600 * 24 * 31  # sane bound
