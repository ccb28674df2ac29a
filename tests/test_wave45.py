"""Wave-45 laws: the review-hardened winnow maintenance surface —
guard symmetry on winnow_matches_from_index (stats without max_df is as
loud as max_df without stats), merge_winnow_stats' optional disjointness
assertion (overlapping sources raise instead of silently double-counting
df), and streaming_winnow_stats' dedup_guard (a replayed document no
longer inflates the streamed df table — parity with the batch
count-distinct twin under duplicated ingest)."""

from __future__ import annotations

import itertools
import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")

_W45_SEQ = itertools.count()


def test_winnow_from_index_stats_requires_cap(spark):
    """The mirror of the cap-requires-stats guard: a caller who built
    and passed a stats frame but forgot max_df intended the stop-gram
    cap — silently running the uncapped quadratic pair join is the
    failure mode, so it must raise."""
    from incubator_flink_old_spark.operators.text import (
        winnow_fingerprints,
        winnow_index_stats,
        winnow_matches_from_index,
    )
    from incubator_flink_old_spark.queries._util import t

    fps = winnow_fingerprints(
        t(spark, SF, "documents").limit(20), k=3, w=4, hashes_only=True
    )
    stats = winnow_index_stats(fps)
    with pytest.raises(ValueError, match="max_df is None"):
        winnow_matches_from_index(fps, stats, max_df=None)


def test_merge_winnow_stats_disjointness_assertion(spark):
    """merge_winnow_stats(doc_keys=...) must (a) accept genuinely
    disjoint sources and return the same digest as the unchecked merge,
    (b) raise naming an offending document when sources overlap, and
    (c) raise on a doc_keys/stats arity mismatch."""
    from incubator_flink_old_spark.operators.text import (
        merge_winnow_stats,
        winnow_fingerprints,
        winnow_index_stats,
    )
    from incubator_flink_old_spark.queries._util import t

    docs = t(spark, SF, "documents").limit(100)
    is_delta = F.col("doc_id") % 5 == 4
    base, delta = docs.filter(~is_delta), docs.filter(is_delta)
    fps_b = winnow_fingerprints(base, k=3, w=4, hashes_only=True)
    fps_d = winnow_fingerprints(delta, k=3, w=4, hashes_only=True)
    sb, sd = winnow_index_stats(fps_b), winnow_index_stats(fps_d)

    checked = merge_winnow_stats(
        sb,
        sd,
        doc_keys=[
            base.select("doc_id"),
            delta.select("doc_id"),
        ],
    )
    unchecked = merge_winnow_stats(sb, sd)
    assert sorted(map(tuple, checked.collect())) == sorted(
        map(tuple, unchecked.collect())
    )

    with pytest.raises(ValueError, match="not disjoint"):
        merge_winnow_stats(
            sb,
            sd,
            doc_keys=[
                base.select("doc_id"),
                # overlap: the delta claims one base document too
                delta.select("doc_id").unionByName(
                    base.select("doc_id").limit(1)
                ),
            ],
        ).collect()

    with pytest.raises(ValueError, match="doc_keys frames"):
        merge_winnow_stats(sb, sd, doc_keys=[base.select("doc_id")])


def test_streaming_winnow_stats_dedup_guard(spark, tmp_path):
    """Under REPLAYED ingest (every document arrives twice) the
    unguarded streamed df table doubles every count — the silent
    divergence from the batch count-distinct twin the review flagged —
    while dedup_guard=True restores exact parity with
    winnow_index_stats over the distinct corpus."""
    from incubator_flink_old_spark.operators.text import (
        streaming_winnow_stats,
        winnow_fingerprints,
        winnow_index_stats,
    )
    from incubator_flink_old_spark.queries._util import t
    from incubator_flink_old_spark.streaming import run_stream_to_memory

    docs = t(spark, SF, "documents").limit(60).select("doc_id", "text")
    src = str(tmp_path / "win_dup_src")
    # two identical files = the whole corpus replayed once
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    docs.coalesce(1).write.mode("append").parquet(src)

    def run(guard: bool) -> list[tuple]:
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        name = f"t_windup_{next(_W45_SEQ)}"
        run_stream_to_memory(
            streaming_winnow_stats(stream, k=3, w=4, dedup_guard=guard),
            name,
            "complete",
            state_partitions=4,
        )
        return sorted(map(tuple, spark.table(name).collect()))

    batch = sorted(
        map(
            tuple,
            winnow_index_stats(
                winnow_fingerprints(docs, k=3, w=4, hashes_only=True)
            ).collect(),
        )
    )
    assert run(True) == batch
    assert run(False) == [(fp, 2 * df) for fp, df in batch]
