"""Property tests for the wave-21 surfaces and round-4 retrieval ops."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import QUERIES, load_all_queries
from incubator_flink_old_spark.sources import from_elements, load_table

load_all_queries()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_entropy_bounded_by_log_vocab(spark, sf_dir):
    """Shannon entropy of a token distribution is ≤ ln(vocab) (uniform
    maximizes) and ≥ 0."""
    out = QUERIES["q_entropy_by_source"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        # 1e-6 slack: the query rounds entropy to 6dp, which can land up
        # to 5e-7 above the exact bound for a near-uniform source
        assert 0.0 <= r["entropy"] <= math.log(r["vocab"]) + 1e-6


def test_bm25_scores_positive_and_tf_monotone(spark):
    """Lucene-form idf is always positive, so BM25 totals are positive;
    with a single shared term, the doc with the higher tf (equal
    lengths) scores strictly higher."""
    from incubator_flink_old_spark.operators.retrieval import bm25_topk

    docs = from_elements(
        spark,
        [
            (1, "apple apple apple pear"),
            (2, "apple pear pear pear"),
            (3, "plum plum plum plum"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bm25"] for r in bm25_topk(docs, terms=("apple",)).collect()}
    assert set(got) == {1, 2}  # doc 3 has no query term
    assert all(v > 0 for v in got.values())
    assert got[1] > got[2]


def test_ewma_within_frame_bounds(spark, sf_dir):
    """An exponentially weighted mean of a window lies within that
    window's [min, max]; checked against the registered query output
    joined back to raw per-user running frames."""
    out = QUERIES["q_ewma"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    bounds = ev.select(
        "event_id",
        F.min("value").over(w).alias("lo"),
        F.max("value").over(w).alias("hi"),
    )
    bad = (
        out.join(bounds, on="event_id")
        .filter(
            (F.col("ewma") < F.col("lo") - 1e-6)
            | (F.col("ewma") > F.col("hi") + 1e-6)
        )
        .count()
    )
    assert bad == 0


def test_stream_interval_join_subset_of_cartesian_window(spark, sf_dir):
    """Every emitted (click, purchase) pair satisfies the time bound and
    key equality — checked against the raw events."""
    out = QUERIES["q_stream_interval_join_parity"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id"), F.col("user_id").alias("u"), F.col("ts"),
        F.col("event_type"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("u").alias("cu"),
        F.col("ts").alias("cts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("u").alias("pu"),
        F.col("ts").alias("pts"),
    )
    joined = out.join(c, on="click_id").join(p, on="purchase_id")
    bad = joined.filter(
        (F.col("cu") != F.col("pu"))
        | (F.col("pts") < F.col("cts"))
        | (F.col("pts") > F.col("cts") + F.expr("INTERVAL 10 minutes"))
        | (F.col("user_id") != F.col("cu"))
    ).count()
    assert bad == 0


def test_pca_projection_spread_positive(spark, sf_dir):
    """The dominant-component projections carry variance (the component
    explains the top of a non-degenerate spectrum)."""
    from incubator_flink_old_spark.operators.similarity import pca_top_component

    emb = load_table(spark, sf_dir, "embeddings")
    vals = [r["pc1"] for r in pca_top_component(emb).collect()]
    assert len(vals) > 1
    mean = sum(vals) / len(vals)
    var = sum((v - mean) ** 2 for v in vals) / len(vals)
    assert var > 0


def test_embed_cov_profile_partition_invariant(spark, sf_dir):
    """The integer-grid covariance is bit-identical under any input
    partitioning (exact BIGINT/DECIMAL sums commute)."""
    from incubator_flink_old_spark.operators.similarity import (
        embedding_covariance,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    a = _rows(embedding_covariance(emb))
    b = _rows(embedding_covariance(emb.repartition(13)))
    assert a == b and len(a) == 64 * 64
