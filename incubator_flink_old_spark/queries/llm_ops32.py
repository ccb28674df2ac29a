"""Training-data pipeline queries, wave 47 (round 12): the semantic
screen's STREAMING deployment form and the semantic-tier absorption —
VERDICT r11 items 1 and 2. Round 11 put the embedding-space screen on
the batch front door (q_semantic_ingest_gate); this wave closes the
front-door matrix's last asymmetric cell by running the SAME screen as
a pure map under Structured Streaming (no window on the stream side —
operators/similarity.semantic_screen_events_map), and gives the
semantic tier the absorption story the lexical tiers already have:
admitted embeddings delta-assigned into the standing grid-IVF
(frozen centers — q_ivf_incremental's recipe), the next wave screened
from the absorbed index, verdict-equal to an oracle that recomputes
the assignment from the union.
"""

from __future__ import annotations

import itertools as _itertools

from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import t
from incubator_flink_old_spark.queries.llm_ops28 import (
    _D_MOD,
    _D_REM,
    _NDS_BAND,
    _NDS_HASHES,
    _NDS_THRESHOLD,
)
from incubator_flink_old_spark.queries.llm_ops30 import (
    _GATE_LANGS,
    _ingest_gate_oracle,
)
from incubator_flink_old_spark.queries.llm_ops31 import (
    _SEM_CELLS,
    _SEM_ITERS,
    _SEM_PROBE,
    _SEM_THRESHOLD,
    _semantic_gate_oracle,
)

_SEQ32 = _itertools.count()


@register("q_stream_semantic_gate_parity", oracle=_semantic_gate_oracle())
def q_stream_semantic_gate_parity(spark, sf_dir):
    """THE SEMANTIC SCREEN AT CRAWL THROUGHPUT — q_semantic_ingest_gate
    re-run as a REAL STREAM (VERDICT r11 item 1, the front-door
    matrix's last asymmetric cell): new documents arrive as a 3-file
    in-event-time-order replay; each arrival's embedding (a
    stream-static join against the new-side embeddings table) probes
    the STANDING grid-IVF through semantic_screen_events_map — the
    probe is a PURE MAP over literal collected centers (array_sort by
    (sim desc, cell asc) + slice, bit-equal to the batch form's
    ROW_NUMBER window, which is illegal stream-side), the candidate
    fetch and verify are stream-static equi-joins against the pinned
    (cells, vectors) artifacts. Quality, language, lexical MinHash and
    the semantic screen all fold in the gate's ONE watermarked
    existence-MAX aggregation — still ONE stateful operator, NO window
    anywhere in the streaming DAG (plan-pinned in
    tests/test_wave47.py).

    Oracle: identical to q_semantic_ingest_gate's — every evidence
    event depends only on its own document (+ frozen artifacts), so
    streaming ≡ batch whatever the micro-batch boundaries. Sentinel
    docs (−1/−2) advance the watermark and are filtered; they carry no
    embedding, so the semantic arm drops them in its stream-static
    inner join — the lexical arms flush the fold.

    Scale: the standing index is trained ONCE batch-side (at 100 TB it
    is the maintained serve artifact — q_semantic_absorb_parity owns
    its delta absorption); per arrival the semantic cost is O(n_cells)
    literal-array work map-side plus a partition-pruned fetch of
    n_probe cells — O(corpus/n_cells · n_probe), never the corpus;
    state stays one row per in-flight document, watermark-evicted."""
    import datetime
    import shutil
    import tempfile
    import time

    from pyspark.storagelevel import StorageLevel

    from incubator_flink_old_spark.operators.similarity import (
        grid_ivf,
        semantic_screen_events_map,
    )
    from incubator_flink_old_spark.operators.text import (
        streaming_ingest_gate,
    )
    from incubator_flink_old_spark.streaming import (
        append_literal_rows,
        run_stream_to_memory,
        write_event_time_replay,
    )

    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    new_d = F.col("doc_id") % _D_MOD == _D_REM
    new_v = F.col("vec_id") % _D_MOD == _D_REM
    corpus = docs.filter(~new_d)
    pinned: list = []
    arts: list = []
    src = tempfile.mkdtemp(prefix="t2_stream_semgate_")
    try:
        # The standing semantic index, trained once batch-side; the
        # centers collect is bounded (_SEM_CELLS = 8 rows — the
        # literal-array probe's contract). cells + corpus vectors are
        # the frozen stream-static serve artifacts: pinned DISK_ONLY
        # once so micro-batches read blocks, not plans.
        corpus_emb = emb.filter(~new_v).select("vec_id", "embedding")
        cells, centers = grid_ivf(
            corpus_emb, n_cells=_SEM_CELLS, iters=_SEM_ITERS
        )
        centers_rows = centers.collect()  # bounded: n_cells rows
        cells = cells.persist(StorageLevel.DISK_ONLY)
        corpus_emb = corpus_emb.persist(StorageLevel.DISK_ONLY)
        # New-side embeddings: the stream-static lookup that attaches
        # each arrival's vector (vec_id = doc_id, the hybrid linkage).
        nemb = (
            emb.filter(new_v)
            .select(F.col("vec_id").alias("doc_id"), "embedding")
            .persist(StorageLevel.DISK_ONLY)
        )
        pinned += [cells, corpus_emb, nemb]

        stream_src = docs.filter(new_d).select(
            "doc_id",
            "text",
            "lang",
            F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id")).alias(
                "ts"
            ),
        )
        write_event_time_replay(stream_src, src, n_files=3)
        mx = stream_src.agg(F.max("ts")).collect()[0][0]  # 1-row finish
        for i in (1, 2):
            append_literal_rows(
                spark,
                src,
                [
                    (
                        -i,
                        "the of and to a",
                        "en",
                        mx + datetime.timedelta(hours=i),
                    )
                ],
                "doc_id long, text string, lang string, ts timestamp",
            )
            time.sleep(0.2)
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, lang string, ts timestamp"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        # The streaming semantic screen: events derive FROM the stream
        # (the extra_screens key-domain contract holds by construction)
        # via a stream-static inner join to the new-side embeddings,
        # then the pure-map probe — no window, no stream-side shuffle.
        sem = semantic_screen_events_map(
            stream.select(
                F.col("doc_id").alias("vec_id"), "ts"
            ).join(
                nemb.select(
                    F.col("doc_id").alias("vec_id"), "embedding"
                ),
                on="vec_id",
            ),
            centers_rows,
            cells,
            corpus_emb,
            n_probe=_SEM_PROBE,
            threshold=_SEM_THRESHOLD,
            carry=("ts",),
        ).select("doc_a", "ts")
        out = streaming_ingest_gate(
            stream,
            corpus,
            langs=_GATE_LANGS,
            num_hashes=_NDS_HASHES,
            band_size=_NDS_BAND,
            jaccard_threshold=_NDS_THRESHOLD,
            screens=("neardup",),
            extra_screens={"semdup": sem},
            event_time="ts",
            watermark_delay="30 seconds",
            materialize_static=True,
            artifact_registry=arts,
        )
        name = f"stream_semgate_{next(_SEQ32)}"
        run_stream_to_memory(out, name, "append", state_partitions=4)
        tbl = (
            spark.table(name)
            .filter(F.col("doc_id") >= 0)
            .localCheckpoint(eager=True)
        )
    finally:
        for f in pinned + arts:
            f.unpersist()
        shutil.rmtree(src, ignore_errors=True)
    return tbl
