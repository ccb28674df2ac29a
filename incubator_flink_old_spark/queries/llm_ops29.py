"""Training-data pipeline queries, wave 44 (round 9, continued): the two
gaps COVERAGE.md round-9 parked — (a) the DENSE arm of the rank-aware
retrieval evaluation (q_retrieval_eval_mrr measures BM25 ranking; nothing
measured whether the dense ANN serving path ranks the known item first
when the query is a degraded view of it), and (b) the WATERMARKED variant
of the streaming near-dup screen (the r09 row's pair-dedup state grows one
row per emitted pair forever; unbounded crawl ingest needs eviction).
"""

from __future__ import annotations

import itertools
import shutil
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import t
from incubator_flink_old_spark.queries.llm_ops11 import (
    _DIM,
    _ITERS,
    _N_CELLS,
    _N_PROBE,
    _grid_ivf_ctes,
    _sql_cos,
)

_SEQ = itertools.count()

#: Known-item protocol knobs: the first N embeddings become queries, each
#: DEGRADED by zeroing every MASK_MOD-th dimension (0-based index i with
#: i % MASK_MOD == 0 → 22 of the 64 dims here) — a deterministic stand-in
#: for "the query is a noisy re-embedding of the document" that both
#: engines reproduce exactly (zeroing is arithmetic, not RNG). MASK_MOD=3
#: is the weakest mask that actually misses at the driver's sf0.01 (one
#: probe miss there AND at sf0.1; mod 4 and even mod 2 leave every
#: self_rank at 1 on the fixtures) — chosen so the checked row measures a
#: real degradation, not a trivially-perfect retrieval.
_DENSE_N_QUERIES = 10
_DENSE_MASK_MOD = 3
_DENSE_TOPK = 10


def _masked_queries(emb, mask_mod: int):
    """(q_id, qv double-array) for the first _DENSE_N_QUERIES embeddings
    with every ``i % mask_mod == 0`` dimension zeroed (0-based). A
    ``mask_mod`` larger than the dimensionality... still zeroes i=0; pass
    ``None`` for the unmasked identity form (law tests)."""
    from incubator_flink_old_spark.operators.similarity import as_double_array

    v = as_double_array("embedding")
    if mask_mod is not None:
        v = F.transform(
            v,
            lambda x, i: F.when(i % mask_mod == 0, F.lit(0.0)).otherwise(x),
        )
    return emb.filter(F.col("vec_id") < _DENSE_N_QUERIES).select(
        F.col("vec_id").alias("q_id"), v.alias("qv")
    )


def _dense_mrr(spark, sf_dir, n_probe: int = _N_PROBE, mask_mod=_DENSE_MASK_MOD):
    """Shared body: grid-IVF serve of the masked query batch, self-rank
    tail. Parameterized so the law tests can pass n_probe=_N_CELLS
    (all-cells ≡ brute force over the corpus) and mask_mod=None
    (identity queries ⇒ self_rank 1 everywhere)."""
    from incubator_flink_old_spark.operators.similarity import (
        as_double_array,
        cosine,
        grid_ivf,
    )
    from incubator_flink_old_spark.queries.llm_ops11 import _grid_probes

    emb = t(spark, sf_dir, "embeddings")
    cells, centers = grid_ivf(emb, n_cells=_N_CELLS, iters=_ITERS)
    queries = _masked_queries(emb, mask_mod)
    # the house probe recipe verbatim (_grid_probes quantizes and ranks
    # the "embedding" column) — the masked qv IS this row's embedding
    probes = _grid_probes(
        queries.select("q_id", F.col("qv").alias("embedding")),
        centers,
        n_probe=n_probe,
    ).join(queries, on="q_id")
    cvec = emb.select("vec_id", as_double_array("embedding").alias("v"))
    ranked = (
        probes.join(cells, on="cell")
        .select("q_id", "qv", "vec_id")
        .join(cvec, on="vec_id")
        .select("q_id", "vec_id", cosine(F.col("qv"), F.col("v")).alias("cos"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
            ),
        )
        .filter(F.col("rnk") <= _DENSE_TOPK)
    )
    self_hit = ranked.filter(F.col("vec_id") == F.col("q_id")).select(
        "q_id", "rnk"
    )
    return (
        queries.select("q_id")
        .join(self_hit, on="q_id", how="left")
        .select(
            "q_id",
            F.coalesce("rnk", F.lit(0)).alias("self_rank"),
            F.coalesce(F.lit(1.0) / F.col("rnk"), F.lit(0.0)).alias("rr"),
        )
    )


def _dense_mrr_oracle() -> str:
    ctes, last_centers = _grid_ivf_ctes()
    return f"""
    WITH {ctes},
    qm AS (
        SELECT vec_id AS q_id,
               list(CASE WHEN (r.j - 1) % {_DENSE_MASK_MOD} = 0 THEN 0.0
                         ELSE v[r.j] END ORDER BY r.j) AS qv
        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
              WHERE vec_id < {_DENSE_N_QUERIES}) s,
             range(1, {_DIM + 1}) r(j)
        GROUP BY vec_id),
    qg AS (
        SELECT q_id, qv,
               list_transform(qv, x -> CAST(FLOOR(x * 1000000.0) AS BIGINT))
                   AS qk
        FROM qm),
    pr AS (
        SELECT q_id, qv, cell FROM (
            SELECT q.q_id, q.qv, c.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.q_id
                       ORDER BY {_sql_cos('q.qk', 'c.cv')} DESC, c.cell
                   ) AS rn
            FROM qg q CROSS JOIN {last_centers} c) t
        WHERE rn <= {_N_PROBE}),
    cv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ranked AS (
        SELECT q_id, vec_id, rnk FROM (
            SELECT p.q_id, a.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.q_id
                       ORDER BY {_sql_cos('p.qv', 'c.v', transform=False)} DESC,
                                a.vec_id
                   ) AS rnk
            FROM pr p JOIN af a ON p.cell = a.cell
            JOIN cv c ON a.vec_id = c.vec_id) t
        WHERE rnk <= {_DENSE_TOPK})
    SELECT q.q_id, COALESCE(r.rnk, 0) AS self_rank,
           COALESCE(1.0 / r.rnk, 0.0) AS rr
    FROM (SELECT DISTINCT q_id FROM qm) q
    LEFT JOIN (SELECT q_id, rnk FROM ranked WHERE vec_id = q_id) r
        ON q.q_id = r.q_id
    """


@register("q_retrieval_eval_mrr_dense", oracle=_dense_mrr_oracle())
def q_retrieval_eval_mrr_dense(spark, sf_dir):
    """RANK-AWARE evaluation of the DENSE serving path — the arm
    q_retrieval_eval_mrr (BM25) left parked: the known-item protocol
    with the query a DEGRADED view of its own document's embedding
    (every 3rd dimension zeroed — deterministic arithmetic both engines
    replay, standing in for a noisy re-embedding / paraphrase query).
    Each masked query runs the production dense serve — grid-IVF probe
    of its {3} nearest of {8} cells, exact raw-double cosine rank over
    the probed candidates — and reports its OWN source vector's rank in
    the top-10 (self_rank, 0 = missed: the item ranked out OR its cell
    went unprobed) and the reciprocal rank. This prices what masking
    costs the full serving path end-to-end — probe misses AND in-cell
    rank slips — where q_ann_recall_prefix prices candidate recall only.

    Laws (tests/test_wave44.py): n_probe=n_cells ⇒ identical rows to a
    brute-force rank of the same masked queries (probe pruning is the
    only approximation); mask_mod=None ⇒ self_rank=1, rr=1.0 for every
    query (the unmasked query's top probe cell is its own assignment
    cell — same quantization, same arithmetic — and self-cosine 1.0 is
    the maximum).

    Scale: queries are a broadcast-sized batch; the probe join is an
    equi-join on cell (partition-pruned under the by-cell layout) and
    per-query cost is n_probe/n_cells of the corpus — the whole eval
    batch amortizes the one k-means train and corpus assignment, the
    dense analogue of bm25_multi_topk's shared-tokenization argument."""
    return _dense_mrr(spark, sf_dir)


# --------------------------------------------------------------------------
# Watermarked streaming near-dup screen: the crawl front door with BOUNDED
# pair-dedup state (eviction once the watermark passes a pair's event time)
# --------------------------------------------------------------------------


def _stream_neardup_wm_oracle() -> str:
    # Result-identical to the unwatermarked screen (multi-band hits of a
    # pair share one arrival row, hence one event time — none can
    # straddle the watermark), so the oracle IS the r09 row's: the batch
    # replay with no stream and no watermark in sight.
    from incubator_flink_old_spark.queries.llm_ops28 import (
        _stream_neardup_oracle,
    )

    return _stream_neardup_oracle()


@register(
    "q_stream_neardup_watermark_parity", oracle=_stream_neardup_wm_oracle()
)
def q_stream_neardup_watermark_parity(spark, sf_dir):
    """The crawl-ingest near-dup screen with BOUNDED dedup state — the
    unbounded-ingest form q_stream_neardup_screen_parity's docstring
    promised ("at 100 TB key it by ingest time under a watermark") now
    checked: each arriving document carries an event time (synthesized
    deterministically from doc_id here), the pair dedup runs as
    dropDuplicatesWithinWatermark under a 30-second watermark, and pair
    state is EVICTED once the watermark passes — state holds the
    in-flight horizon, not every pair ever emitted. Result-identical to
    the unwatermarked screen for ANY delay (a pair's multi-band hits all
    derive from its single arrival row, so they share one microbatch and
    one event time — no duplicate can straddle the watermark), hence the
    oracle is the same batch SQL replay, hash-checked.

    The replay arrives IN EVENT-TIME ORDER (four files by ts quartile,
    written sequentially so the file source replays them oldest-first)
    — the regime a watermark models: a crawl's ingest time is its
    arrival order. An out-of-order replay would genuinely drop
    below-watermark batches as LATE (measured: the shuffled 4-file
    replay loses ~40% of pairs at sf0.01 under a 30 s delay) — that is
    watermark semantics doing its job, not a parity bug, and the
    in-order replay is the honest fixture for it. Because batches
    advance in event time, the watermark PASSES earlier batches' pairs
    and their dedup state is really evicted during the run.

    Scale: this is the missing piece for a crawl that never stops — the
    corpus side stays the materialized (band, bucket)-bucketed table,
    per-batch cost stays O(batch candidates), and the one previously
    unbounded state store is now horizon-bounded."""
    from incubator_flink_old_spark.operators.text import (
        streaming_neardup_screen,
    )
    from incubator_flink_old_spark.queries.llm_ops28 import (
        _D_MOD,
        _D_REM,
        _NDS_BAND,
        _NDS_HASHES,
        _NDS_THRESHOLD,
    )
    from incubator_flink_old_spark.streaming import run_stream_to_memory

    docs = t(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % _D_MOD == _D_REM
    corpus = docs.filter(~is_new)
    arts: list = []  # persisted corpus artifacts; released in finally
    src = tempfile.mkdtemp(prefix="t2_stream_ndw_")
    try:
        new_docs = docs.filter(is_new).select(
            "doc_id",
            "text",
            F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id")).alias(
                "ts"
            ),
        )
        # In-event-time-order replay (see docstring — out-of-order
        # replay = legitimate late drops); the shared fixture helper
        # owns the sequential-write/modtime invariant.
        from incubator_flink_old_spark.streaming import (
            write_event_time_replay,
        )

        write_event_time_replay(new_docs, src, n_files=4)
        stream = (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        out = streaming_neardup_screen(
            stream,
            corpus,
            num_hashes=_NDS_HASHES,
            band_size=_NDS_BAND,
            jaccard_threshold=_NDS_THRESHOLD,
            event_time="ts",
            watermark_delay="30 seconds",
            materialize_static=True,
            artifact_registry=arts,
        )
        name = f"stream_ndw_{next(_SEQ)}"
        run_stream_to_memory(out, name, "append", state_partitions=4)
        tbl = spark.table(name).localCheckpoint(eager=True)
    finally:
        for a in arts:
            a.unpersist()
        shutil.rmtree(src, ignore_errors=True)
    return tbl.select("doc_a", "doc_b", "jaccard")


# --------------------------------------------------------------------------
# Deterministic epoch shuffle: reproducible dataloader order + sharding
# --------------------------------------------------------------------------

_ES_EPOCHS = 2
_ES_SHARDS = 8


def _epoch_shuffle_oracle() -> str:
    return f"""
    WITH ep AS (
        SELECT d.doc_id, CAST(r.e AS INTEGER) AS epoch
        FROM documents d, range(0, {_ES_EPOCHS}) r(e)),
    h AS (
        SELECT epoch, doc_id,
               ('0x' || substr(md5(epoch::VARCHAR || '|' || doc_id::VARCHAR),
                               1, 15))::BIGINT AS h60
        FROM ep)
    SELECT epoch, doc_id,
           CAST(h60 % {_ES_SHARDS} AS INTEGER) AS shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY epoch, h60 % {_ES_SHARDS}
               ORDER BY h60, doc_id) AS BIGINT) AS pos
    FROM h
    """


@register("q_epoch_shuffle", oracle=_epoch_shuffle_oracle())
def q_epoch_shuffle(spark, sf_dir):
    """DETERMINISTIC EPOCH SHUFFLE (operators/text.epoch_shuffle) — the
    training-dataloader primitive no prior row covered: each of 2 epochs
    assigns every document a portable 60-bit md5 hash salted by the
    epoch, shard = hash % 8, in-shard position = hash-order rank. A
    seeded, engine-independent permutation per epoch: rerunning on any
    cluster/partitioning/engine materializes the SAME training order
    (rand()-based shuffles cannot promise that), different epochs never
    share an order, and the whole job is one hash-partition + in-shard
    sort — the physical plan that writes a 100 TB corpus as per-epoch
    dataloader shards with no global sort.

    Laws (tests/test_wave44.py): per (epoch, shard) the positions are
    exactly 1..shard_size (a true permutation, no gaps/ties) and the two
    epochs produce different orders; shard sizes stay within binomial
    bounds of n/8."""
    from incubator_flink_old_spark.operators.text import epoch_shuffle

    return epoch_shuffle(
        t(spark, sf_dir, "documents"), epochs=_ES_EPOCHS, n_shards=_ES_SHARDS
    )


# --------------------------------------------------------------------------
# Lexical vs semantic dedup agreement: which tier catches which pairs
# --------------------------------------------------------------------------


def _dedup_agreement_oracle() -> str:
    from incubator_flink_old_spark.queries.llm_ops import _minhash_oracle

    lex_sql = _minhash_oracle(band_size=4).strip()
    return f"""
    WITH lex AS MATERIALIZED ({lex_sql}),
    svv AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings),
    su AS (
        SELECT vec_id,
               list_transform(ve, x -> x / sqrt(list_dot_product(ve, ve))) AS uv
        FROM svv),
    sseeds AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cell, uv AS cu
        FROM (SELECT * FROM su ORDER BY vec_id LIMIT 8)),
    ssim AS (
        SELECT su.vec_id, s.cell, list_dot_product(su.uv, s.cu) AS sim
        FROM su, sseeds s),
    sasg AS (
        SELECT vec_id, cell
        FROM (SELECT vec_id, cell,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY sim DESC, cell) AS rn
              FROM ssim)
        WHERE rn = 1),
    sau AS (SELECT a.vec_id, a.cell, u.uv FROM sasg a JOIN su u USING (vec_id)),
    sem AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM sau a JOIN sau b ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.uv, b.uv) >= 0.35),
    j AS (
        SELECT l.doc_a IS NOT NULL AS lex_hit, s.vec_a IS NOT NULL AS sem_hit
        FROM lex l FULL OUTER JOIN sem s
            ON l.doc_a = s.vec_a AND l.doc_b = s.vec_b)
    SELECT CASE WHEN lex_hit AND sem_hit THEN 'both'
                WHEN lex_hit THEN 'lex_only'
                ELSE 'sem_only' END AS category,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM j GROUP BY 1
    """


@register("q_dedup_agreement", oracle=_dedup_agreement_oracle())
def q_dedup_agreement(spark, sf_dir):
    """CROSS-TIER DEDUP AGREEMENT AUDIT — the question a curation team
    asks before choosing dedup tiers and thresholds: of all pairs
    flagged by EITHER the lexical tier (MinHash-LSH, exact-jaccard
    verified ≥ 0.7 — q_dedup_minhash's pipeline) or the semantic tier
    (SemDeDup within-cell unit-cosine ≥ 0.35 over the documents'
    embeddings — q_semantic_dedup's pair set, exposed by
    operators/similarity.semantic_pairs), how many does each tier catch
    alone and how many do both agree on. 'lex_only' pairs are
    boilerplate/templates semantic embeddings blur together with
    everything else; 'sem_only' pairs are paraphrases token-level
    jaccard can't see — the two failure modes a layered dedup stack
    exists to cover.

    Both pair sets are the EXACT pipelines of their standing rows (same
    signatures, banding, verify; same quantizer, normalization, dot) —
    this row only full-outer-joins them on the shared id space
    (embedding vec_id ≡ document doc_id, the q_retrieval_hybrid
    convention) and counts.

    Scale: each tier's pair set is candidate-pruned by its own index
    (band buckets / cells); the agreement join is an equi-join on the
    pair key — digest-sized relative to the corpus."""
    from incubator_flink_old_spark.operators.similarity import semantic_pairs
    from incubator_flink_old_spark.operators.text import minhash_lsh_pairs

    lex = minhash_lsh_pairs(t(spark, sf_dir, "documents"), band_size=4).select(
        "doc_a", "doc_b", F.lit(True).alias("lex_hit")
    )
    sem = semantic_pairs(t(spark, sf_dir, "embeddings")).select(
        F.col("vec_a").alias("doc_a"),
        F.col("vec_b").alias("doc_b"),
        F.lit(True).alias("sem_hit"),
    )
    j = lex.join(sem, on=["doc_a", "doc_b"], how="full_outer")
    return (
        j.select(
            F.when(
                F.coalesce("lex_hit", F.lit(False))
                & F.coalesce("sem_hit", F.lit(False)),
                F.lit("both"),
            )
            .when(F.coalesce("lex_hit", F.lit(False)), F.lit("lex_only"))
            .otherwise(F.lit("sem_only"))
            .alias("category")
        )
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --------------------------------------------------------------------------
# l-diversity: the privacy audit k-anonymity alone misses
# --------------------------------------------------------------------------


@register(
    "q_l_diversity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_sensitive,
           COUNT(DISTINCT o_orderpriority) >= 3 AS l_ok
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def q_l_diversity(spark, sf_dir):
    """l-DIVERSITY audit (operators/text.l_diversity) — the disclosure
    k-anonymity alone misses: a quasi-identifier class can be large
    (k_ok) yet carry a single sensitive value, so releasing it still
    tells an attacker that value for everyone in the class (the
    homogeneity attack). Per (nationkey, mktsegment) class over the
    customer-order release join: class size, distinct sensitive values
    (order priority), and the l=3 policy flag — the companion worklist
    to q_k_anonymity's.

    Scale: one hash groupBy; the distinct count partial-aggregates
    (per-partition distinct sets), so shuffle volume is classes ×
    distinct sensitive values, never the release rows."""
    from incubator_flink_old_spark.operators.text import l_diversity

    joined = (
        t(spark, sf_dir, "customer")
        .join(
            t(spark, sf_dir, "orders"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select("c_nationkey", "c_mktsegment", "o_orderpriority")
    )
    return l_diversity(
        joined,
        quasi=("c_nationkey", "c_mktsegment"),
        sensitive="o_orderpriority",
        l=3,
    )


# --------------------------------------------------------------------------
# Join hot-key audit: the skew detector beside q_salted_join's mitigation
# --------------------------------------------------------------------------

_HOTKEY_THRESHOLD = 5000


@register(
    "q_join_hotkeys",
    oracle=f"""
    WITH c AS (
        SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id)
    SELECT key, cnt AS cnt_left, cnt AS cnt_right,
           CAST(cnt * cnt AS BIGINT) AS est_rows,
           cnt * cnt >= {_HOTKEY_THRESHOLD} AS hot
    FROM c
    """,
)
def q_join_hotkeys(spark, sf_dir):
    """JOIN HOT-KEY AUDIT (operators/joins.join_hotkey_audit) — the
    pre-flight skew detector beside the standing mitigation
    (q_salted_join): per join key, each side's row count and their
    product = the key's EXACT output cardinality under the inner
    equi-join, flagged at a threshold. Run here as the self-join audit
    for the events funnel family (q_funnel / q_event_transitions
    self-join events on user_id): est_rows is count² — the quadratic
    blowup one celebrity user hides until the join OOMs at 100 TB.
    Two digest-sized count aggregations instead of paying the shuffle
    to find out.

    Driver-comparison note (VERDICT r09 item 1): the operator keeps the
    overflow-proof DECIMAL(38,0) product internally (a celebrity key
    past ~3e9 rows/side wraps a non-ANSI BIGINT product negative), but
    the row the driver hash-compares emits ``est_rows`` as BIGINT —
    exact at any realistic fixture scale (count² < 2^63 up to 3e9
    rows/side) and canonicalized identically by every engine, where the
    r09 driver canonicalizer hash-mismatched the DECIMAL form that
    tools/driver_sim.py matched (the r02 array-encoding / r03 HUGEINT
    red class). ``hot`` is still decided on the decimal product, and
    the BIGINT emission is GUARDED: past 2^63−1 Spark's non-ANSI
    decimal→bigint cast would silently return NULL where the DuckDB
    oracle's BIGINT product raises — the assert_true makes both engines
    FAIL identically at the boundary instead of NULL-vs-error (review
    finding; unreachable below ~3e9 rows/side).

    Scale: shuffle = distinct keys (map-side combinable counts), one
    equi-join of the two digests — cost independent of the join's
    output size, which is the whole point."""
    from incubator_flink_old_spark.operators.joins import (
        checked_bigint,
        join_hotkey_audit,
    )

    ev = t(spark, sf_dir, "events")
    return join_hotkey_audit(
        ev, ev, "user_id", threshold=_HOTKEY_THRESHOLD
    ).withColumn(
        "est_rows",
        checked_bigint(
            F.col("est_rows"),
            "q_join_hotkeys: est_rows exceeds BIGINT — a key past ~3e9"
            " rows/side; report the DECIMAL audit directly instead of"
            " the BIGINT emission",
        ),
    )


# --------------------------------------------------------------------------
# Deterministic weighted mixture schedule: stride-interleave the sources
# --------------------------------------------------------------------------

#: Power-of-two weights ⇒ r/w is an exact binary division, so the
#: cross-source virtual-time ties compare bit-identically on both engines
#: (see mixture_schedule's docstring).
_MIX_WEIGHTS = (("src0", 4.0), ("src1", 2.0), ("src2", 1.0), ("src3", 1.0))


def _mixture_schedule_oracle() -> str:
    values = ", ".join(f"('{s}', {w})" for s, w in _MIX_WEIGHTS)
    return f"""
    WITH w(source, wt) AS (SELECT * FROM (VALUES {values})),
    r AS (
        SELECT d.doc_id, d.source, w.wt,
               ROW_NUMBER() OVER (
                   PARTITION BY d.source
                   ORDER BY ('0x' || substr(md5(d.doc_id::VARCHAR),
                                            1, 15))::BIGINT, d.doc_id
               ) AS src_rank
        FROM documents d JOIN w USING (source))
    SELECT doc_id, source, CAST(src_rank AS BIGINT) AS src_rank,
           CAST(ROW_NUMBER() OVER (
               ORDER BY src_rank / wt, source, doc_id) AS BIGINT)
               AS sched_pos
    FROM r
    """


@register("q_mixture_schedule", oracle=_mixture_schedule_oracle())
def q_mixture_schedule(spark, sf_dir):
    """WEIGHTED MIXTURE SCHEDULE (operators/text.mixture_schedule) —
    the missing step between deciding a mixture (q_data_mixture /
    q_temperature_mixture compute weights, q_domain_cap caps) and
    training on it: materialize the ONE global order in which the run
    consumes the corpus so every prefix holds the sources in weight
    proportion (stride scheduling: document r of source s at virtual
    time r/w_s). A 4:2:1:1 mixture over four sources here; sources
    outside the mixture are excluded by design. Deterministic on any
    engine/cluster — per-source seeded hash order + exact power-of-two
    divisions — where a rand()-interleaved dataloader order is
    unreproducible.

    Laws (tests/test_wave44.py): every prefix's per-source share is
    within one stride of the weight proportion; each source's
    subsequence preserves its hash order; reruns are bit-identical.

    Scale: runs the operator's skew_safe mode (round 12) — the
    per-source hash rank via the two-level range-partitioned form
    (per_group_row_number), so a mega-source never funnels one task —
    plus the global range numbering over digest triples; the range
    exchange IS the sharded schedule layout a dataloader reads.
    Bit-identical to the window form (law, tests/test_wave47.py)."""
    from incubator_flink_old_spark.operators.text import mixture_schedule

    return mixture_schedule(
        t(spark, sf_dir, "documents"), dict(_MIX_WEIGHTS), skew_safe=True
    )


# --------------------------------------------------------------------------
# Robust winnowing: MOSS fingerprint selection with the detection guarantee
# --------------------------------------------------------------------------

_WIN_K = 3
_WIN_W = 4


def _winnow_ctes(src: str = "documents", prefix: str = "") -> str:
    """Shared winnowing CTE chain (through ``{prefix}sel`` = the
    selected fingerprints) for the fingerprint row and the match row.
    ``src`` is the source relation (must expose doc_id, text) and
    ``prefix`` namespaces the CTE names so two chains can coexist in one
    WITH list (the drift-audit row winnows base and drifted-delta
    separately — the _grid_ivf_ctes parameterization discipline).
    NOTE: the parameterization itself CHANGED the rendered SQL once (a
    ``wq`` self-alias the prefixing requires), so every winnow oracle's
    hash moved in round 10 and those rows were re-fronted; from here on
    the defaults are stable, but any future edit to this template must
    re-front every row whose oracle embeds it (review finding — do not
    trust a byte-stability claim across template edits)."""
    k, w = _WIN_K, _WIN_W
    p = prefix
    return rf"""
    {p}tt AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS tk
        FROM {src}),
    {p}hp AS (
        SELECT doc_id, tk, unnest(range(1, len(tk) - {k} + 2)) AS p
        FROM {p}tt WHERE len(tk) >= {k}),
    {p}hg AS (
        SELECT doc_id, CAST(p AS BIGINT) AS pos,
               ('0x' || substr(md5(array_to_string(tk[p:p + {k - 1}],
                                                   ' ')), 1, 15))::BIGINT AS h
        FROM {p}hp),
    {p}nn AS (SELECT doc_id, COUNT(*) AS nh FROM {p}hg GROUP BY doc_id),
    {p}wq AS (
        SELECT doc_id,
               unnest(range(1, GREATEST(nh - {w} + 1, 1) + 1)) AS q
        FROM {p}nn),
    {p}wins AS (
        SELECT h.doc_id, wq.q, h.pos, h.h
        FROM {p}wq wq JOIN {p}hg h ON h.doc_id = wq.doc_id
                 AND h.pos BETWEEN wq.q AND wq.q + {w} - 1),
    {p}sel AS (
        SELECT doc_id, pos, h FROM (
            SELECT doc_id, q, pos, h,
                   ROW_NUMBER() OVER (PARTITION BY doc_id, q
                                      ORDER BY h, pos DESC) AS rn
            FROM {p}wins) t
        WHERE rn = 1)"""


def _winnow_oracle() -> str:
    return f"""
    WITH {_winnow_ctes()}
    SELECT DISTINCT doc_id, pos, h AS fp FROM sel
    """


@register("q_winnow_fingerprints", oracle=_winnow_oracle())
def q_winnow_fingerprints(spark, sf_dir):
    """ROBUST WINNOWING (operators/text.winnow_fingerprints) — the MOSS
    fingerprint-selection scheme the dedup family lacked: hash every
    3-token shingle, slide a 4-hash window, keep each window's minimum
    (rightmost on ties). The selected ~2/(w+1) of shingles carry a
    PROVABLE guarantee: any ≥ w+k-1 = 6-token substring match between
    two documents surfaces as a shared selected hash — the
    deterministic no-false-negative floor MinHash banding (probability)
    and q_dup_spans' fixed-stride windows (alignment-sensitive) don't
    give. At 100 TB this is what makes corpus-wide span dedup joinable:
    the cross-doc equi-join runs over the winnowed set at a fraction of
    the shingle volume.

    Map-side selection (one expression pipeline per row, no
    explode-then-window shuffle — the oracle's explode form is the SQL
    twin, not the plan); laws in tests/test_wave44.py pin the window
    COVERAGE invariant (every window contains a selected position) and
    the detection guarantee on adversarial synthetic pairs."""
    from incubator_flink_old_spark.operators.text import winnow_fingerprints

    return winnow_fingerprints(
        t(spark, sf_dir, "documents"), k=_WIN_K, w=_WIN_W
    )


_WIN_MIN_SHARED = 2
_WIN_MAX_DF = 100


def _winnow_matches_oracle() -> str:
    return f"""
    WITH {_winnow_ctes()},
    dfp AS (SELECT DISTINCT doc_id, h FROM sel),
    kept AS (
        SELECT h FROM dfp GROUP BY h
        HAVING COUNT(DISTINCT doc_id) <= {_WIN_MAX_DF}),
    capped AS (SELECT dfp.doc_id, dfp.h FROM dfp JOIN kept USING (h))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(DISTINCT a.h) AS BIGINT) AS shared_fps
    FROM capped a JOIN capped b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY doc_a, doc_b
    HAVING COUNT(DISTINCT a.h) >= {_WIN_MIN_SHARED}
    """


@register("q_winnow_matches", oracle=_winnow_matches_oracle())
def q_winnow_matches(spark, sf_dir):
    """CROSS-DOC SPAN MATCHES over the winnowed set
    (operators/text.winnow_matches) — the consumer the selection scheme
    exists for: equi-join selected hashes across documents, keep pairs
    sharing ≥ 2 distinct fingerprints (one shared k-gram is a common
    phrase, not a copied span), with the doc-frequency cap (≤ 100 docs
    per fingerprint) dropping stop-gram hashes BEFORE the pair join —
    one ubiquitous phrase otherwise contributes f²/2 candidate pairs,
    the exact celebrity-key blowup q_join_hotkeys detects. The cap
    sacrifices recall only on spans whose EVERY fingerprint is
    corpus-ubiquitous — the boilerplate span dedup wants to ignore.

    Scale: df filter = one combinable groupBy over the winnowed ~40%%
    of shingles; the pair join is hash-pruned by construction. The
    winnowing guarantee still floors detection for any surviving
    ≥ 6-token span."""
    from incubator_flink_old_spark.operators.text import winnow_matches

    return winnow_matches(
        t(spark, sf_dir, "documents"),
        k=_WIN_K,
        w=_WIN_W,
        min_shared=_WIN_MIN_SHARED,
        max_df=_WIN_MAX_DF,
    )


def _stream_winnow_oracle(
    new_pred: str | None = None, scope_pred: str | None = None
) -> str:
    from incubator_flink_old_spark.queries.llm_ops28 import _D_MOD, _D_REM

    # Winnowing is per-document, so selecting over the full table and
    # splitting new/corpus AFTER is value-identical to computing each
    # side separately — the batch replay needs no stream in sight.
    # new_pred/scope_pred follow _stream_neardup_oracle's contract (the
    # lifecycle oracle's wave split). Defaults are stable going forward,
    # but see _winnow_ctes' note: the r10 parameterization moved every
    # winnow oracle hash once (rows re-fronted).
    new_pred = new_pred or f"doc_id % {_D_MOD} = {_D_REM}"
    src = (
        f"(SELECT doc_id, text FROM documents WHERE {scope_pred}) winsrc"
        if scope_pred
        else "documents"
    )
    return f"""
    WITH {_winnow_ctes(src=src)},
    dfp AS (
        SELECT DISTINCT doc_id, {new_pred} AS is_new, h
        FROM sel),
    kept AS (
        SELECT h FROM dfp WHERE NOT is_new GROUP BY h
        HAVING COUNT(DISTINCT doc_id) <= {_WIN_MAX_DF})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.h AS fp
    FROM dfp a
    JOIN dfp b ON a.h = b.h AND a.is_new AND NOT b.is_new
    JOIN kept k ON a.h = k.h
    """


@register("q_stream_winnow_screen_parity", oracle=_stream_winnow_oracle())
def q_stream_winnow_screen_parity(spark, sf_dir):
    """STREAMING WINNOWED SCREEN ⇄ batch parity — the crawl front
    door's DETERMINISTIC sibling (operators/text.streaming_winnow_screen):
    new documents arrive as a real 4-file multi-batch stream, each
    computes its winnowed fingerprints map-side (the selection pipeline
    is expression-only — legal on a stream by construction, unlike any
    window-function formulation) and probes the frozen, df-capped
    corpus fingerprint index through a stream-static equi-join on the
    hash, emitting distinct (new doc, corpus doc, fp) match events.
    Where q_stream_neardup_screen_parity's MinHash probe is
    probabilistic, every ≥ 6-token span shared with the corpus is
    GUARANTEED at least one event here. Each event depends only on its
    own two token streams ⇒ streaming ≡ batch for any boundaries; the
    oracle replays selection, cap and probe in SQL with no stream.

    Scale: corpus side is a materialized fp-bucketed table; per-batch
    cost O(batch fingerprints); dedup state one row per event (key by
    ingest time under a watermark for unbounded ingest — the
    event_time recipe applies verbatim)."""
    from incubator_flink_old_spark.operators.text import (
        streaming_winnow_screen,
    )
    from incubator_flink_old_spark.queries.llm_ops28 import _D_MOD, _D_REM
    from incubator_flink_old_spark.streaming import run_stream_to_memory

    docs = t(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % _D_MOD == _D_REM
    arts: list = []  # persisted corpus artifacts; released in finally
    src = tempfile.mkdtemp(prefix="t2_stream_win_")
    try:
        (
            docs.filter(is_new)
            .select("doc_id", "text")
            .repartition(4)
            .write.mode("overwrite")
            .parquet(src)
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        out = streaming_winnow_screen(
            stream,
            docs.filter(~is_new),
            k=_WIN_K,
            w=_WIN_W,
            max_df=_WIN_MAX_DF,
            materialize_static=True,
            artifact_registry=arts,
        )
        name = f"stream_win_{next(_SEQ)}"
        run_stream_to_memory(out, name, "append", state_partitions=4)
        tbl = spark.table(name).localCheckpoint(eager=True)
    finally:
        for a in arts:
            a.unpersist()
        shutil.rmtree(src, ignore_errors=True)
    return tbl.select("doc_a", "doc_b", "fp")


_WIN_DELTA_MOD = 5
_WIN_DELTA_REM = 4


@register("q_winnow_incremental", oracle=_winnow_matches_oracle())
def q_winnow_incremental(spark, sf_dir):
    """Incremental SPAN-DEDUP index maintenance — the winnow tier's
    entry in the maintenance matrix (IVF/BM25/SQ8/PQ/prefix already
    have theirs): a 20% delta batch of new documents (doc_id % 5 == 4)
    is absorbed by computing its winnowed fingerprints MAP-SIDE
    (selection never crosses documents — the existing corpus is never
    re-shingled) and MERGING the per-fingerprint document-frequency
    statistics by integer SUM (operators/text.winnow_index_stats /
    merge_winnow_stats — the merge_bm25_stats mergeability applied to
    the stop-gram cap). The union index is then served through the
    SHARED cap/join algebra (winnow_matches_from_index, which
    winnow_matches itself delegates to), so the incremental match set
    is BIT-IDENTICAL to a full recompute — exactly what the oracle
    checks: it winnows and caps the whole corpus directly, no merge in
    sight (the q_bm25_incremental oracle discipline).

    Scale: absorbing crawl deltas into a corpus-wide span-dedup index
    is O(delta) shingling + a digest-sized (fp, df) merge; the df cap
    stays exact under any split because df is a sum over per-doc
    distinct rows of disjoint sources. Laws (tests/test_wave44.py):
    merged stats ≡ union-recomputed stats; merged-index matches ≡
    winnow_matches over the union; cap-without-stats raises."""
    from incubator_flink_old_spark.operators.text import (
        merge_winnow_stats,
        winnow_fingerprints,
        winnow_index_stats,
        winnow_matches_from_index,
    )

    docs = t(spark, sf_dir, "documents")
    is_delta = F.col("doc_id") % _WIN_DELTA_MOD == _WIN_DELTA_REM
    base_fps = winnow_fingerprints(
        docs.filter(~is_delta), k=_WIN_K, w=_WIN_W, hashes_only=True
    )
    delta_fps = winnow_fingerprints(
        docs.filter(is_delta), k=_WIN_K, w=_WIN_W, hashes_only=True
    )
    merged = merge_winnow_stats(
        winnow_index_stats(base_fps), winnow_index_stats(delta_fps)
    )
    return winnow_matches_from_index(
        base_fps.unionByName(delta_fps),
        merged,
        min_shared=_WIN_MIN_SHARED,
        max_df=_WIN_MAX_DF,
    )


@register("q_stream_winnow_stats_parity", oracle=_winnow_matches_oracle())
def q_stream_winnow_stats_parity(spark, sf_dir):
    """STREAMING winnow-index statistics ⇄ batch parity — the span-dedup
    tier's streaming absorption, closing BOTH maintenance axes for the
    winnow index in one round (batch absorb: q_winnow_incremental;
    streaming here — the matrix posture IVF/BM25/SQ8/PQ/prefix already
    hold): documents arrive as a REAL 4-file multi-batch stream and the
    per-fingerprint document frequencies are maintained continuously by
    operators/text.streaming_winnow_stats — map-side winnowed selection
    per arriving doc, one streaming groupBy-SUM per fp, state = the
    (fp, df) table itself. Counts are an integer-sum monoid over
    once-only arrivals, so the landed stats are bit-identical to
    winnow_index_stats over the whole corpus for any batch boundaries
    (law-pinned in tests/test_wave44.py); the row then injects the
    LIVE stats into the shipped serve (winnow_matches_from_index's
    stop-gram cap) and reports the corpus span matches — hash-checked
    against a plain full recompute, no stream in sight (the
    q_stream_bm25_stats_parity discipline: the cap statistics were
    never computed batch-side at all).

    Scale: the live span-dedup index costs a map over each batch's
    documents plus a combinable per-fp partial sum; state is the df
    table the serve needs anyway, hash-partitioned by fp."""
    from incubator_flink_old_spark.operators.text import (
        streaming_winnow_stats,
        winnow_fingerprints,
        winnow_matches_from_index,
    )
    from incubator_flink_old_spark.streaming import run_stream_to_memory

    docs = t(spark, sf_dir, "documents")
    src = tempfile.mkdtemp(prefix="t2_stream_winstats_")
    try:
        (
            docs.select("doc_id", "text")
            .repartition(4)
            .write.mode("overwrite")
            .parquet(src)
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        out = streaming_winnow_stats(stream, k=_WIN_K, w=_WIN_W)
        name = f"stream_winstats_{next(_SEQ)}"
        run_stream_to_memory(out, name, "complete", state_partitions=4)
        live_stats = spark.table(name).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    fps = winnow_fingerprints(docs, k=_WIN_K, w=_WIN_W, hashes_only=True)
    return winnow_matches_from_index(
        fps, live_stats, min_shared=_WIN_MIN_SHARED, max_df=_WIN_MAX_DF
    )


# --------------------------------------------------------------------------
# Random-projection ANN tier: data-independent 16-dim sketch, exact-integer
# --------------------------------------------------------------------------

_RP_DIM = 16


def _rp_signs() -> tuple[tuple[float, ...], ...]:
    """±1 Achlioptas sign matrix derived from md5(j|i) — deterministic,
    engine-independent, embedded as LITERALS in both the Spark plan and
    the oracle SQL (the _MQ_QUERIES literal-fixture recipe), so neither
    engine ever computes a hash at query time."""
    import hashlib

    from incubator_flink_old_spark.queries.llm_ops11 import _DIM as _D

    def sign(j: int, i: int) -> float:
        h = hashlib.md5(f"{j}|{i}".encode()).hexdigest()
        return 1.0 if int(h[0], 16) < 8 else -1.0

    return tuple(
        tuple(sign(j, i) for i in range(_D)) for j in range(_RP_DIM)
    )


_RP_SIGNS = _rp_signs()


def _rp_vec(kcol):
    """RP-{16} sketch of a grid vector: per output dim, the ±1-signed
    sum of the 64 grid longs, floor-divided by 64 (a POWER OF TWO — the
    division is float-exact, floor matches on both engines) so every
    sketch component stays ≤ the grid magnitude and the stage-A squared
    distances remain exact-integer-valued doubles < 2^53 (the grid
    recipe's exactness budget; the raw signed sums would overflow it)."""
    kd = F.transform(kcol, lambda x: x.cast("double"))
    comps = []
    for row in _RP_SIGNS:
        sarr = F.array(*[F.lit(s) for s in row])
        comps.append(
            F.floor(
                F.aggregate(
                    F.zip_with(kd, sarr, lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.lit(64.0)
            ).cast("double")
        )
    return F.array(*comps)


def _rp_recall_df(spark, sf_dir, refine_c=None):
    """Shared body of q_ann_recall_rp; the law test passes
    refine_c ≥ pool to prove exact-over-cells."""
    from incubator_flink_old_spark.operators.similarity import (
        grid_ivf,
        grid_sqdist,
    )
    from incubator_flink_old_spark.queries.llm_ops11 import (
        _ITERS,
        _N_CELLS,
        _N_QUERIES,
        _TOPK,
        _grid_probes,
    )
    from incubator_flink_old_spark.queries.llm_ops18 import _grid_vec
    from incubator_flink_old_spark.queries.llm_ops26 import _REFINE_C

    refine_c = _REFINE_C if refine_c is None else refine_c
    emb = t(spark, sf_dir, "embeddings")
    cells, centers = grid_ivf(emb, n_cells=_N_CELLS, iters=_ITERS)
    eg = emb.select("vec_id", _grid_vec().alias("k"))
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    probes = _grid_probes(queries, centers)
    cand = probes.join(cells, on="cell").select("q_id", "vec_id")
    # stage A: 16-dim RP-sketch scan over the probed pool
    rp = eg.select("vec_id", _rp_vec(F.col("k")).alias("r"))
    qr = rp.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("r").alias("qr")
    )
    wc = Window.partitionBy("q_id").orderBy("pd", "vec_id")
    shortlist = (
        cand.join(rp, on="vec_id")
        .join(F.broadcast(qr), on="q_id")
        .select(
            "q_id", "vec_id", grid_sqdist(F.col("qr"), F.col("r")).alias("pd")
        )
        .withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= refine_c)
        .select("q_id", "vec_id")
    )
    # stage B: full-dim refine + brute-force ground truth (family shape)
    kd = eg.select(
        "vec_id", F.transform("k", lambda x: x.cast("double")).alias("kd")
    )
    qk = kd.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("kd").alias("qv")
    )
    w = Window.partitionBy("q_id").orderBy("d", "vec_id")
    it = (
        shortlist.join(kd, on="vec_id")
        .join(F.broadcast(qk), on="q_id")
        .select(
            "q_id", "vec_id", grid_sqdist(F.col("qv"), F.col("kd")).alias("d")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select(F.col("q_id").alias("iq"), F.col("vec_id").alias("ivec"))
    )
    bt = (
        F.broadcast(qk)
        .crossJoin(kd.select("vec_id", F.col("kd").alias("cv")))
        .select(
            "q_id", "vec_id", grid_sqdist(F.col("qv"), F.col("cv")).alias("d")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select("q_id", "vec_id")
    )
    return (
        bt.join(it, (bt.q_id == it.iq) & (bt.vec_id == it.ivec), "left")
        .groupBy("q_id")
        .agg(
            F.count("ivec").alias("hits"),
            (F.count("ivec").cast("double") / _TOPK).alias("recall"),
        )
    )


def _rp_oracle() -> str:
    from incubator_flink_old_spark.queries.llm_ops11 import (
        _N_PROBE,
        _N_QUERIES,
        _TOPK,
        _grid_ivf_ctes,
        _sql_cos,
        _sql_sqdist,
    )
    from incubator_flink_old_spark.queries.llm_ops26 import _REFINE_C

    ivf_ctes, last_centers = _grid_ivf_ctes()
    comps = ", ".join(
        "CAST(FLOOR(list_dot_product(kd, [{lits}]) / 64.0) AS DOUBLE)".format(
            lits=", ".join(str(s) for s in row)
        )
        for row in _RP_SIGNS
    )
    return f"""
    WITH {ivf_ctes},
    q AS (
        SELECT vec_id AS q_id, k FROM e WHERE vec_id < {_N_QUERIES}),
    pr AS (
        SELECT q_id, cell FROM (
            SELECT q.q_id, c.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.q_id
                       ORDER BY {_sql_cos('q.k', 'c.cv')} DESC, c.cell
                   ) AS rn
            FROM q CROSS JOIN {last_centers} c) t
        WHERE rn <= {_N_PROBE}),
    rp AS (
        SELECT vec_id, [{comps}] AS r
        FROM (SELECT vec_id,
                     list_transform(k, x -> CAST(x AS DOUBLE)) AS kd
              FROM e) s),
    qr AS (SELECT vec_id AS q_id, r FROM rp WHERE vec_id < {_N_QUERIES}),
    sh AS (
        SELECT q_id, vec_id FROM (
            SELECT p.q_id, a.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.q_id
                       ORDER BY {_sql_sqdist('qr.r', 'ra.r')}, a.vec_id
                   ) AS rn
            FROM pr p JOIN af a ON p.cell = a.cell
            JOIN rp ra ON a.vec_id = ra.vec_id
            JOIN qr ON qr.q_id = p.q_id) t
        WHERE rn <= {_REFINE_C}),
    it AS (
        SELECT q_id, vec_id FROM (
            SELECT s.q_id, s.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.q_id
                       ORDER BY {_sql_sqdist('q.k', 'e2.k')}, s.vec_id
                   ) AS rn
            FROM sh s JOIN e e2 ON s.vec_id = e2.vec_id
            JOIN q ON q.q_id = s.q_id) t
        WHERE rn <= {_TOPK}),
    bt AS (
        SELECT q_id, vec_id FROM (
            SELECT q.q_id, c.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.q_id
                       ORDER BY {_sql_sqdist('q.k', 'c.k')}, c.vec_id) AS rn
            FROM q CROSS JOIN e c) t
        WHERE rn <= {_TOPK})
    SELECT b.q_id,
           CAST(COUNT(i.vec_id) AS BIGINT) AS hits,
           CAST(COUNT(i.vec_id) AS DOUBLE) / {_TOPK}.0 AS recall
    FROM bt b
    LEFT JOIN it i ON b.q_id = i.q_id AND b.vec_id = i.vec_id
    GROUP BY b.q_id
    """


@register("q_ann_recall_rp", oracle=_rp_oracle())
def q_ann_recall_rp(spark, sf_dir):
    """MEASURED recall@5 for IVF + RANDOM-PROJECTION sketch scan +
    full-dim refine — the DATA-INDEPENDENT compression axis beside the
    four learned/structural ones (SQ8 values, PQ subspaces, IVF
    candidates, prefix dimensions): stage A scans a 16-dim ±1-signed
    Achlioptas sketch of each probed vector (sign matrix derived from
    md5(j|i) and embedded as literals on BOTH engines — no training, no
    per-corpus artifact, nothing to maintain under drift by
    construction), stage B removes the sketch error for the refine_c
    shortlist with full-dim point reads. Where the prefix tier bets the
    leading dims carry the signal (true for matryoshka-trained
    embeddings, false for isotropic ones — priced in PERF.md r08), RP
    spreads EVERY input dim across the sketch, so its recall is
    insensitive to how information is laid out across dimensions — the
    right stage-A tier when the embedding provider made no such
    promise. Same bytes scanned as prefix-16.

    Exactness: signed sums of grid longs are floor-divided by 64 (a
    power of two — float-exact) so every sketch component and stage-A
    squared distance stays an exact-integer-valued double < 2^53; the
    whole pipeline hash-replays in SQL.

    Laws (tests/test_wave44.py): refine_c ≥ pool ⇒ identical to the
    exact ranking over the probed cells; the sketch is deterministic
    across reruns. Measured (PERF.md): recall vs the prefix tier at
    the same refine budget on the isotropic fixture."""
    return _rp_recall_df(spark, sf_dir)
