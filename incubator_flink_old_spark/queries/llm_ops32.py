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
        force_pins,
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
        # Force the serve pins at the session's batch width — lazy,
        # they'd build inside micro-batch 0 at the clamped state width
        # (optimization round 12; see streaming.force_pins).
        force_pins(cells, corpus_emb, nemb)

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
            # mtime ordering is handled by append_literal_rows itself (utime)
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


# --------------------------------------------------------------------------
# Semantic-tier absorption: admitted embeddings delta-assigned into the
# standing IVF, the next wave screened from the absorbed index
# --------------------------------------------------------------------------

#: The semantic absorption rule: quality + lang + no semantic near-dup.
#: (The lexical screens have their own absorb row — q_ingest_absorb_parity;
#: this row isolates the semantic tier so a verdict flip can only come
#: from the absorbed INDEX, not a lexical side effect.)
_SEM_ABSORB_RULE = "quality_ok AND lang_ok AND NOT has_semdup"


def _sem_quant(src_pred: str) -> str:
    return (
        "SELECT vec_id, list_transform(embedding::DOUBLE[],"
        " x -> CAST(FLOOR(x * 1000000.0) AS BIGINT)) AS k"
        f" FROM embeddings WHERE {src_pred}"
    )


def _sem_wave_ctes(
    prefix: str, query_pred: str, cells_rel: str, last_centers: str
) -> tuple[str, ...]:
    """Probe + verify CTEs for one wave: ``{prefix}q`` quantized
    queries, ``{prefix}p`` the top-n_probe cells vs ``last_centers``
    (the engine's exact (sim desc, cell) ROW_NUMBER), ``{prefix}v``
    the distinct verified semdup hits against ``cells_rel`` =
    (vec_id, k, cell) — the standing-or-absorbed index."""
    from incubator_flink_old_spark.queries.llm_ops11 import _sql_cos

    return (
        f"""{prefix}q AS (
        SELECT vec_id AS q_id, k AS qk FROM ({_sem_quant(query_pred)}) t)""",
        f"""{prefix}p AS (
        SELECT q_id, cell, qk FROM (
            SELECT q.q_id, c.cell, q.qk,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.q_id
                       ORDER BY {_sql_cos('q.qk', 'c.cv')} DESC, c.cell
                   ) AS rn
            FROM {prefix}q q CROSS JOIN {last_centers} c) t
        WHERE rn <= {_SEM_PROBE})""",
        f"""{prefix}v AS (
        SELECT DISTINCT p.q_id
        FROM {prefix}p p JOIN {cells_rel} a ON p.cell = a.cell
        WHERE {_sql_cos('p.qk', 'a.k')} >= {_SEM_THRESHOLD}
          AND p.q_id <> a.vec_id)""",
    )


def _sem_absorb_cte_block() -> str:
    """Stitched twin of the semantic absorption loop. Wave 1 screens
    against the corpus0-trained index (the _grid_ivf_ctes replay); the
    oracle then RECOMPUTES wave 2's index as the frozen-center
    assignment of the UNION corpus (corpus0 ∪ wave-1 absorbs) — the
    engine path under test absorbs by grid_assign APPEND, so their
    verdict equality is exactly the delta-absorb ≡ recompute claim
    (q_ivf_incremental's law, promoted to a driver-checked row through
    the whole front door). Centers are trained ONCE on corpus0 in both
    waves — absorption never re-trains (the g2 chain re-renders the
    same corpus0 train only because a nested WITH cannot see g1's CTEs;
    it is the identical deterministic computation)."""
    from incubator_flink_old_spark.queries.llm_ops11 import (
        _grid_ivf_ctes,
        _sql_cos,
    )

    ivf1, last1 = _grid_ivf_ctes(
        n_cells=_SEM_CELLS,
        iters=_SEM_ITERS,
        src="(SELECT * FROM embeddings WHERE vec_id % 5 <= 2)",
        prefix="s1",
    )
    g1 = _ingest_gate_oracle(
        new_pred="doc_id % 5 = 3",
        screens=(),
        extra_ctes=(ivf1,)
        + _sem_wave_ctes("w1", "vec_id % 5 = 3", "s1af", last1),
        extra_flags=(
            ("has_semdup", "doc_id IN (SELECT q_id FROM w1v)"),
        ),
    )
    ivf2, last2 = _grid_ivf_ctes(
        n_cells=_SEM_CELLS,
        iters=_SEM_ITERS,
        src="(SELECT * FROM embeddings WHERE vec_id % 5 <= 2)",
        prefix="s2",
    )
    union_ctes = (
        ivf2,
        f"""ue AS (
        {_sem_quant(
            "vec_id % 5 <= 2 OR vec_id IN (SELECT doc_id FROM a1)"
        )})""",
        f"""au AS (
        SELECT vec_id, k, cell FROM (
            SELECT e.vec_id, e.k, c.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_sql_cos('e.k', 'c.cv')} DESC, c.cell
                   ) AS rn
            FROM ue e CROSS JOIN {last2} c) t
        WHERE rn = 1)""",
    )
    g2 = _ingest_gate_oracle(
        new_pred="doc_id % 5 = 4",
        screens=(),
        extra_ctes=union_ctes
        + _sem_wave_ctes("w2", "vec_id % 5 = 4", "au", last2),
        extra_flags=(
            ("has_semdup", "doc_id IN (SELECT q_id FROM w2v)"),
        ),
    )
    return f"""
    WITH g1 AS MATERIALIZED ({g1}),
    a1 AS (SELECT doc_id FROM g1 WHERE {_SEM_ABSORB_RULE}),
    g2 AS MATERIALIZED ({g2})
    """


def _semantic_absorb_oracle() -> str:
    return f"""
    {_sem_absorb_cte_block()}
    SELECT CAST(1 AS BIGINT) AS wave, doc_id, quality_ok, lang_ok,
           has_semdup, {_SEM_ABSORB_RULE} AS absorbed
    FROM g1
    UNION ALL
    SELECT CAST(2 AS BIGINT) AS wave, doc_id, quality_ok, lang_ok,
           has_semdup, {_SEM_ABSORB_RULE} AS absorbed
    FROM g2
    """


@register("q_semantic_absorb_parity", oracle=_semantic_absorb_oracle())
def q_semantic_absorb_parity(spark, sf_dir):
    """SEMANTIC-TIER ABSORPTION (VERDICT r11 item 2) — the semantic
    analog of q_ingest_absorb_parity: the standing grid-IVF is trained
    ONCE on the base corpus (vec_id % 5 ≤ 2) and frozen; wave 1
    (% 5 = 3) is gated on quality + lang + the IVF-probed semantic
    screen against that index; its ABSORBED documents' embeddings are
    delta-assigned to the FROZEN centers (grid_assign — the map-only
    q_ivf_incremental recipe, NO re-train, NO corpus re-assignment)
    and APPENDED to the standing (vec_id, cell) layout; wave 2
    (% 5 = 4) is then screened from the ABSORBED index — a wave-2
    paraphrase of a wave-1 admit is caught by exactly the rows the
    absorb appended (law-pinned in tests/test_wave47.py, where an
    absorbed admit flips a wave-2 verdict the frozen index misses).
    The oracle RECOMPUTES wave 2's index as the frozen-center
    assignment of the union corpus — absorb ≡ recompute at the verdict
    level, the map-purity claim (assign(union) = assign(base) ∪
    assign(delta)) driver-checked end-to-end.

    Scale: absorbing a wave costs O(wave) — one broadcast-centers map
    over the admitted embeddings plus a partition append to the by-cell
    layout; wave-2 serve cost is unchanged (broadcast probe +
    partition-pruned cell fetch). The plan never re-trains on or
    re-assigns the standing corpus: the only Lloyd train reads corpus0
    once (plan-pinned — wave 2's DAG reads the persisted index, no
    second train)."""
    from pyspark.storagelevel import StorageLevel

    from incubator_flink_old_spark.operators.similarity import (
        grid_assign,
        grid_ivf,
        semantic_screen_events,
    )
    from incubator_flink_old_spark.operators.text import (
        streaming_ingest_gate,
    )

    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    m5d, m5v = F.col("doc_id") % 5, F.col("vec_id") % 5
    w1_docs = docs.filter(m5d == 3).select("doc_id", "text", "lang")
    w2_docs = docs.filter(m5d == 4).select("doc_id", "text", "lang")
    corpus0_emb = emb.filter(m5v <= 2).select("vec_id", "embedding")
    w1_emb = emb.filter(m5v == 3).select("vec_id", "embedding")
    w2_emb = emb.filter(m5v == 4).select("vec_id", "embedding")

    absorbed = (
        F.col("quality_ok") & F.col("lang_ok") & ~F.col("has_semdup")
    ).alias("absorbed")

    # The standing index, trained ONCE and pinned (DISK_ONLY — the
    # absorb-row heap discipline); every later read is blocks.
    cells0, centers = grid_ivf(
        corpus0_emb, n_cells=_SEM_CELLS, iters=_SEM_ITERS
    )
    pinned = [
        f.persist(StorageLevel.DISK_ONLY)
        for f in (cells0, centers, corpus0_emb)
    ]
    cells0, centers, corpus0_emb = pinned

    def semi(events, wave_docs):
        # extra_screens key-domain contract (ADVICE r11): structural,
        # not a fixture invariant.
        return events.select("doc_a").join(
            wave_docs.select(F.col("doc_id").alias("doc_a")),
            on="doc_a",
            how="leftsemi",
        )

    try:
        sem1 = semi(
            semantic_screen_events(
                w1_emb,
                corpus0_emb,
                n_probe=_SEM_PROBE,
                threshold=_SEM_THRESHOLD,
                index=(cells0, centers),
            ),
            w1_docs,
        )
        g1 = streaming_ingest_gate(
            w1_docs,
            None,
            langs=_GATE_LANGS,
            screens=(),
            extra_screens={"semdup": sem1},
        ).localCheckpoint(eager=True)
        pinned.append(g1)
        # The O(wave) absorb: admitted embeddings delta-assigned to the
        # FROZEN centers (map-only; the standing corpus is never
        # re-assigned), appended to the standing by-cell layout.
        adm1_emb = w1_emb.join(
            g1.filter(
                F.col("quality_ok")
                & F.col("lang_ok")
                & ~F.col("has_semdup")
            ).select(F.col("doc_id").alias("vec_id")),
            on="vec_id",
        )
        cells1 = cells0.unionByName(grid_assign(adm1_emb, centers))
        emb1 = corpus0_emb.unionByName(adm1_emb)
        sem2 = semi(
            semantic_screen_events(
                w2_emb,
                emb1,
                n_probe=_SEM_PROBE,
                threshold=_SEM_THRESHOLD,
                index=(cells1, centers),
            ),
            w2_docs,
        )
        g2 = streaming_ingest_gate(
            w2_docs,
            None,
            langs=_GATE_LANGS,
            screens=(),
            extra_screens={"semdup": sem2},
        )

        def tag(g, wave):
            return g.select(
                F.lit(wave).cast("long").alias("wave"),
                "doc_id",
                "quality_ok",
                "lang_ok",
                "has_semdup",
                absorbed,
            )

        # Materialize before releasing the pins (checkpoint blocks
        # cannot be recomputed once dropped).
        out = tag(g1, 1).unionByName(tag(g2, 2)).localCheckpoint(eager=True)
    finally:
        for f in pinned:
            f.unpersist()
    return out


# --------------------------------------------------------------------------
# The training-data factory, end-to-end: crawl gate -> calibration ->
# mixture schedule -> token-budget chunks, ONE checked row
# --------------------------------------------------------------------------


#: The factory's mixture weights, over the sources the NEW wave can
#: contain: source tracks doc_id % 10 in the fixture, and the wave is
#: doc_id % 5 = 4 — so admitted docs are src4/src9 only (the llm_ops29
#: _MIX_WEIGHTS src0..src3 would exclude the whole wave). Powers of two,
#: per the mixture_schedule exactness contract.
_FACTORY_WEIGHTS = (("src4", 2.0), ("src9", 1.0))


def _factory_oracle() -> str:
    """The stitched curriculum twin (VERDICT r11 item 4 — the
    q_curate_full discipline applied to the schedule side): the four
    stages' VERIFIED oracles composed in one WITH, each restricted to
    the previous stage's survivors — the gate's verdicts
    (_ingest_gate_oracle verbatim), q_quality_calibration's
    percent_rank cut over the ADMITTED docs, q_mixture_schedule's
    stride schedule over the KEPT docs, q_token_budget_schedule's
    running prefix over that schedule."""
    from incubator_flink_old_spark.queries.llm_ops31 import (
        _ABSORB_RULE,
        _CAL_KEEP_FRAC,
        _TB_BUDGET,
    )

    values = ", ".join(f"('{s}', {w})" for s, w in _FACTORY_WEIGHTS)
    return rf"""
    WITH g AS MATERIALIZED ({_ingest_gate_oracle(screens=("neardup",))}),
    adm AS (
        SELECT d.doc_id, d.text, d.source
        FROM documents d JOIN g USING (doc_id) WHERE {_ABSORB_RULE}),
    ktoks AS (
        SELECT doc_id,
               list_distinct(list_filter(
                   string_split_regex(lower(text), '\s+'), x -> x <> ''
               )) AS tk,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS tka
        FROM adm),
    kbase AS (
        SELECT d.doc_id, d.source,
               CAST(len(list_filter(t.tka,
                   x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
                   / len(t.tka) AS stopword_ratio,
               1.0 - CAST(len(t.tk) AS DOUBLE) / len(t.tka) AS repetition,
               LENGTH(d.text) BETWEEN 100 AND 20000 AS len_ok
        FROM adm d JOIN ktoks t USING (doc_id)),
    kq AS (
        SELECT doc_id, source,
               0.5 * stopword_ratio + 0.3 * (1.0 - repetition)
                 + 0.2 * CAST(len_ok AS DOUBLE) AS quality
        FROM kbase),
    cal AS (
        SELECT doc_id,
               PERCENT_RANK() OVER (
                   PARTITION BY source
                   ORDER BY quality DESC NULLS LAST, doc_id)
                 <= {_CAL_KEEP_FRAC} AS keep
        FROM kq),
    kept AS (
        SELECT a.doc_id, a.text, a.source
        FROM adm a JOIN cal c USING (doc_id) WHERE c.keep),
    w(source, wt) AS (SELECT * FROM (VALUES {values})),
    r AS (
        SELECT k.doc_id, k.source, w.wt,
               ROW_NUMBER() OVER (
                   PARTITION BY k.source
                   ORDER BY ('0x' || substr(md5(k.doc_id::VARCHAR),
                                            1, 15))::BIGINT, k.doc_id
               ) AS src_rank
        FROM kept k JOIN w USING (source)),
    sched AS (
        SELECT doc_id, source, src_rank,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY src_rank / wt, source, doc_id) AS BIGINT)
                   AS sched_pos
        FROM r),
    cnt AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                    x -> x <> '')) AS BIGINT) AS n_tokens
        FROM kept),
    run AS (
        SELECT s.doc_id, s.source, s.sched_pos, c.n_tokens,
               SUM(c.n_tokens) OVER (
                   ORDER BY s.sched_pos
                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM sched s JOIN cnt c USING (doc_id))
    SELECT doc_id, source, sched_pos, n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           (CAST(cum_tokens AS BIGINT) - n_tokens) // {_TB_BUDGET}
               AS chunk_id
    FROM run
    """


@register("q_training_factory_e2e", oracle=_factory_oracle())
def q_training_factory_e2e(spark, sf_dir):
    """THE TRAINING-DATA FACTORY IN ONE ROW (VERDICT r11 item 4) —
    crawl → curriculum, end-to-end: new documents pass the composed
    ingest front door (quality + lang + MinHash near-dup + winnowed
    span vs the standing corpus — q_ingest_gate's exact gate), the
    ADMITTED set is calibrated per source (skew-safe two-level
    percent_rank, top 75% per source — q_quality_calibration), the
    KEPT set is stride-scheduled into the one reproducible mixture
    order (q_mixture_schedule) and chunked by token budget via ONE
    distributed prefix sum (q_token_budget_schedule). Every stage is
    individually driver-green; this row checks their COMPOSITION — the
    admitted/kept boundaries feed forward, so a single gate flip moves
    every downstream sched_pos/chunk_id, and the oracle recomputes the
    whole chain in one stitched WITH.

    Scale: the gate is the one corpus-shaped stage (equi-join probes +
    one evidence fold); everything downstream is admitted-sized — the
    calibration's two-level rank range-partitions (no per-source
    funnel), the schedule's global numbering and the token prefix sum
    are the distributed two-pass forms (no empty-partitionBy window
    anywhere — plan-pinned in tests/test_wave47.py), and the final
    range exchange IS the chunk-sharded layout a dataloader reads.
    This is the 100 TB shape: each curriculum rebuild touches the
    admitted wave, never the standing corpus."""
    from incubator_flink_old_spark.operators.text import (
        quality_calibrate,
        streaming_ingest_gate,
        token_budget_chunks,
    )
    from incubator_flink_old_spark.queries.llm_ops31 import (
        _CAL_KEEP_FRAC,
        _TB_BUDGET,
    )

    docs = t(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % _D_MOD == _D_REM
    new_docs = docs.filter(is_new).select(
        "doc_id", "text", "lang", "source"
    )
    # Near-dup arm only, selection by the absorb rule (quality + lang +
    # no verified near-dup): the fixture corpus is winnow-span-SATURATED
    # at every knob (the documented _ABSORB_RULE rationale,
    # llm_ops31/q_ingest_lifecycle) — a span-gated factory would
    # schedule nothing and every downstream stage would be vacuously
    # "checked" on empty frames.
    gate = streaming_ingest_gate(
        new_docs,
        docs.filter(~is_new),
        langs=_GATE_LANGS,
        num_hashes=_NDS_HASHES,
        band_size=_NDS_BAND,
        jaccard_threshold=_NDS_THRESHOLD,
        screens=("neardup",),
    )
    # Admitted docs feed three downstream reads (calibration, the kept
    # join, the schedule's token counts) — pin once, release after the
    # result materializes.
    admitted = new_docs.join(
        gate.filter(
            F.col("quality_ok")
            & F.col("lang_ok")
            & ~F.col("has_neardup")
        ).select("doc_id"),
        on="doc_id",
    ).localCheckpoint(eager=True)
    try:
        cal = quality_calibrate(
            admitted, keep_frac=_CAL_KEEP_FRAC, skew_safe=True
        )
        kept = admitted.join(
            cal.filter("keep").select("doc_id"), on="doc_id"
        )
        out = token_budget_chunks(
            kept,
            budget=_TB_BUDGET,
            weights=dict(_FACTORY_WEIGHTS),
            skew_safe=True,
        ).localCheckpoint(eager=True)
    finally:
        admitted.unpersist()
    return out


def _stream_sem_absorb_oracle() -> str:
    """Wave 2 of the semantic absorb oracle, alone, in the streamed
    gate's full verdict schema: every evidence event depends only on
    its own document + the frozen merged index, so streaming ≡ batch
    whatever the micro-batch boundaries (the q_stream_absorb_parity
    argument, over the absorbed SEMANTIC index)."""
    return f"""
    {_sem_absorb_cte_block()}
    SELECT doc_id, quality_ok, lang_ok, has_neardup, has_spandup,
           has_semdup, admit
    FROM g2
    """


@register(
    "q_stream_semantic_absorb_parity", oracle=_stream_sem_absorb_oracle()
)
def q_stream_semantic_absorb_parity(spark, sf_dir):
    """THE ABSORBED SEMANTIC INDEX SERVES THE LIVE CRAWL — the
    front-door matrix's fourth absorption cell, composing this round's
    two new pieces into the operating state: wave 1 is gated and
    absorbed batch-side exactly as in q_semantic_absorb_parity (frozen
    corpus0-trained centers, admitted embeddings delta-assigned by the
    grid_assign map and APPENDED), then wave 2 arrives as a REAL 3-file
    event-time replay and its semantic screen executes as the PURE-MAP
    probe (semantic_screen_events_map) whose static sides ARE the
    absorbed (cells, vectors) artifacts — the index a wave just updated
    immediately screens the next wave's live arrivals, with no window
    on the stream side and still ONE watermarked stateful fold. Two
    far-future sentinels advance the watermark (filtered from the
    returned table; they carry no embedding, so the semantic arm drops
    them in its stream-static inner join while the base arm flushes).

    Companion cells: q_ingest_absorb_parity (lexical, batch),
    q_stream_absorb_parity (lexical, streamed),
    q_semantic_absorb_parity (semantic, batch — shares this row's g2
    oracle scope). Together the absorb × tier × deployment matrix is
    closed.

    Scale: absorption cost O(wave) (map-only delta assign + append);
    per-arrival serve cost O(n_cells) literal-array work + a
    partition-pruned fetch of n_probe cells against the DISK_ONLY-
    pinned merged artifacts; state is one row per in-flight document,
    watermark-evicted."""
    import datetime
    import shutil
    import tempfile

    from pyspark.storagelevel import StorageLevel

    from incubator_flink_old_spark.operators.similarity import (
        grid_assign,
        grid_ivf,
        semantic_screen_events,
        semantic_screen_events_map,
    )
    from incubator_flink_old_spark.operators.text import (
        streaming_ingest_gate,
    )
    from incubator_flink_old_spark.streaming import (
        append_literal_rows,
        force_pins,
        run_stream_to_memory,
        write_event_time_replay,
    )

    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    m5d, m5v = F.col("doc_id") % 5, F.col("vec_id") % 5
    w1_docs = docs.filter(m5d == 3).select("doc_id", "text", "lang")
    corpus0_emb = emb.filter(m5v <= 2).select("vec_id", "embedding")
    w1_emb = emb.filter(m5v == 3).select("vec_id", "embedding")

    cells0, centers = grid_ivf(
        corpus0_emb, n_cells=_SEM_CELLS, iters=_SEM_ITERS
    )
    centers_rows = centers.collect()  # bounded: n_cells rows
    pinned = [
        f.persist(StorageLevel.DISK_ONLY)
        for f in (cells0, centers, corpus0_emb)
    ]
    cells0, centers, corpus0_emb = pinned
    src = tempfile.mkdtemp(prefix="t2_stream_semabsorb_")
    try:
        # Batch wave-1 gate + absorb (the q_semantic_absorb_parity
        # path verbatim: frozen centers, O(wave) delta append).
        sem1 = (
            semantic_screen_events(
                w1_emb,
                corpus0_emb,
                n_probe=_SEM_PROBE,
                threshold=_SEM_THRESHOLD,
                index=(cells0, centers),
            )
            .select("doc_a")
            .join(
                w1_docs.select(F.col("doc_id").alias("doc_a")),
                on="doc_a",
                how="leftsemi",
            )
        )
        # Pin wave 1's verdicts: BOTH merged static frames (cells1 and
        # emb1) read them, and each persisted frame materializes its
        # own plan — unpinned, the whole wave-1 gate would run twice
        # (measured on the round-12 pair: this row landed at 22.9 s
        # pair-min before the pin).
        g1 = streaming_ingest_gate(
            w1_docs,
            None,
            langs=_GATE_LANGS,
            screens=(),
            extra_screens={"semdup": sem1},
        ).localCheckpoint(eager=True)
        pinned.append(g1)
        adm1_emb = w1_emb.join(
            g1.filter(
                F.col("quality_ok")
                & F.col("lang_ok")
                & ~F.col("has_semdup")
            ).select(F.col("doc_id").alias("vec_id")),
            on="vec_id",
        )
        # The merged static sides, pinned ONCE (stream-static joins
        # re-evaluate unpinned static plans per micro-batch — the
        # materialize_static lesson applied to absorbed artifacts).
        cells1 = cells0.unionByName(
            grid_assign(adm1_emb, centers)
        ).persist(StorageLevel.DISK_ONLY)
        emb1 = corpus0_emb.unionByName(adm1_emb).persist(
            StorageLevel.DISK_ONLY
        )
        pinned += [cells1, emb1]
        # Force the absorbed serve pins at the session's batch width
        # (optimization round 12; see streaming.force_pins). nemb2 is
        # forced below, right after its own persist.
        force_pins(cells1, emb1)

        w2_stream_src = docs.filter(m5d == 4).select(
            "doc_id",
            "text",
            "lang",
            F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id")).alias(
                "ts"
            ),
        )
        write_event_time_replay(w2_stream_src, src, n_files=3)
        mx = w2_stream_src.agg(F.max("ts")).collect()[0][0]  # 1-row finish
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
            # mtime ordering is handled by append_literal_rows itself (utime)
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, lang string, ts timestamp"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        nemb2 = emb.filter(m5v == 4).select(
            F.col("vec_id").alias("doc_id"), "embedding"
        ).persist(StorageLevel.DISK_ONLY)
        pinned.append(nemb2)
        force_pins(nemb2)
        sem2 = semantic_screen_events_map(
            stream.select(F.col("doc_id").alias("vec_id"), "ts").join(
                nemb2.select(F.col("doc_id").alias("vec_id"), "embedding"),
                on="vec_id",
            ),
            centers_rows,
            cells1,
            emb1,
            n_probe=_SEM_PROBE,
            threshold=_SEM_THRESHOLD,
            carry=("ts",),
        ).select("doc_a", "ts")
        out = streaming_ingest_gate(
            stream,
            None,
            langs=_GATE_LANGS,
            screens=(),
            extra_screens={"semdup": sem2},
            event_time="ts",
            watermark_delay="30 seconds",
        )
        name = f"stream_semabsorb_{next(_SEQ32)}"
        run_stream_to_memory(out, name, "append", state_partitions=4)
        tbl = (
            spark.table(name)
            .filter(F.col("doc_id") >= 0)
            .localCheckpoint(eager=True)
        )
    finally:
        for f in pinned:
            f.unpersist()
        shutil.rmtree(src, ignore_errors=True)
    return tbl
