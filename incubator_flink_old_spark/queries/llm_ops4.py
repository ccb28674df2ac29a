"""Training-data pipeline queries, wave 4: substring-level (span)
duplication, token-budget sequence packing, incremental new-batch-vs-
corpus dedup. All pure Column expressions with exact DuckDB twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_flink_old_spark.operators.text import (
    duplicate_spans,
    incremental_dedup,
    pack_sequences,
)
from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import t

#: DuckDB twin of operators.text.tokens() (non-distinct form)
_SQL_TKA = r"""
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tka
    FROM documents
"""

_W = 8  # duplicate-span window width (tokens)


@register(
    "q_dup_spans",
    oracle=rf"""
    WITH toks AS ({_SQL_TKA}),
    d AS (SELECT doc_id, tka, len(tka) AS n FROM toks),
    wins AS (
        SELECT doc_id, i AS pos,
               md5(array_to_string(list_slice(tka, i, i + {_W - 1}), ' ')) AS wh
        FROM d, unnest(generate_series(1, n - {_W - 1})) u(i)
        WHERE n >= {_W}),
    dup AS (SELECT wh FROM wins GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2),
    hits AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (wh)),
    seq AS (
        SELECT doc_id, pos,
               LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM hits),
    per AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS dup_windows,
               SUM(CASE WHEN nxt IS NULL THEN {_W}
                        ELSE LEAST({_W}, nxt - pos) END) AS cov
        FROM seq GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(d.n AS BIGINT) AS n_tokens,
           COALESCE(p.dup_windows, 0) AS dup_windows,
           ROUND(COALESCE(CAST(p.cov AS DOUBLE) / d.n, 0.0), 6)
               AS dup_token_frac
    FROM d LEFT JOIN per p USING (doc_id)
    """,
)
def q_dup_spans(spark, sf_dir):
    """Span-level duplication profile: per document, how many of its
    8-token windows appear verbatim in ANOTHER document, and the
    fraction of its tokens those duplicated windows cover (merged
    intervals, not double-counted). The windowed-hash dataflow form of
    suffix-array substring dedup — the curation signal behind "remove
    boilerplate/verbatim-copied spans" policies, computed in three
    map-side-combinable shuffles with xxhash64 long keys."""
    return duplicate_spans(t(spark, sf_dir, "documents"), window=_W)


@register(
    "q_pack_sequences",
    oracle=rf"""
    WITH toks AS ({_SQL_TKA}),
    d AS (
        SELECT doc_id,
               CAST(len(tka) AS BIGINT) AS n_tok,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8
                   AS bucket
        FROM toks),
    s AS (
        SELECT doc_id, n_tok, bucket,
               CAST(SUM(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id)
                    - n_tok AS BIGINT) AS pack_pos
        FROM d)
    SELECT doc_id, n_tok, bucket,
           CAST(FLOOR(pack_pos / 512.0) AS BIGINT) AS pack_id,
           pack_pos
    FROM s
    """,
)
def q_pack_sequences(spark, sf_dir):
    """Token-budget sequence packing: documents land in 8 hash-bucketed
    packing streams; each stream's token flow is chopped every 512
    tokens and a doc joins the pack holding its first token. One window
    cumsum per bucket — parallel by construction, no global sort."""
    return pack_sequences(
        t(spark, sf_dir, "documents"), capacity=512, buckets=8
    )


def _incremental_oracle(
    split_mod: int = 5,
    num_hashes: int = 8,
    band_size: int = 4,
    threshold: float = 0.7,
) -> str:
    """DuckDB twin of operators.text.incremental_dedup: same md5 split,
    same normalized-text fingerprint, same MinHash banding (the Spark
    side's size-ratio prefilter is result-identical by the jaccard bound,
    so the oracle omits it)."""
    mh_exprs = ",\n               ".join(
        f"list_aggregate(list_transform(tk, x -> md5('{j}|' || x)), 'min') AS mh{j}"
        for j in range(num_hashes)
    )
    n_bands = num_hashes // band_size
    band_selects = "\n        UNION ALL\n        ".join(
        "SELECT doc_id, is_new, {b} AS band, md5({expr}) AS bucket FROM sigs".format(
            b=b,
            expr=" || '|' || ".join(f"mh{b * band_size + r}" for r in range(band_size)),
        )
        for b in range(n_bands)
    )
    return rf"""
    WITH base AS (
        SELECT doc_id, text,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % {split_mod} = 0 AS is_new
        FROM documents),
    toks AS (
        SELECT doc_id, is_new,
               list_distinct(list_filter(
                   string_split_regex(lower(text), '\s+'), x -> x <> ''
               )) AS tk
        FROM base),
    sigs AS (
        SELECT doc_id, is_new, tk,
               {mh_exprs}
        FROM toks),
    bands AS (
        {band_selects}
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
        WHERE a.is_new AND NOT b.is_new),
    near AS (
        SELECT DISTINCT c.doc_a AS doc_id
        FROM cands c
        JOIN toks ta ON c.doc_a = ta.doc_id
        JOIN toks tb ON c.doc_b = tb.doc_id
        WHERE CAST(len(list_intersect(ta.tk, tb.tk)) AS DOUBLE)
                / len(list_distinct(list_concat(ta.tk, tb.tk))) >= {threshold}),
    norm AS (
        SELECT doc_id, is_new,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM base),
    exact AS (
        SELECT DISTINCT n.doc_id
        FROM norm n JOIN norm c ON n.fp = c.fp
        WHERE n.is_new AND NOT c.is_new)
    SELECT b.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'keep' END AS verdict
    FROM base b
    LEFT JOIN exact e ON b.doc_id = e.doc_id
    LEFT JOIN near nr ON b.doc_id = nr.doc_id
    WHERE b.is_new
    """


@register("q_incremental_dedup", oracle=_incremental_oracle())
def q_incremental_dedup(spark, sf_dir):
    """Nightly-ingest dedup decision: a deterministic ~20% hash slice of
    the corpus plays the NEW batch; every new doc is classified
    exact_dup (fingerprint already in the standing corpus), near_dup
    (MinHash-LSH jaccard ≥ 0.7 against ≥1 corpus doc — candidates are
    new×corpus ONLY, never corpus×corpus), or keep. The probe-side-only
    candidate join is what makes continuous ingest O(batch) at 100 TB —
    the corpus's fingerprint and band tables are precomputed and
    bucketed, so each night's batch streams through without reshuffling
    the corpus."""
    return incremental_dedup(
        t(spark, sf_dir, "documents"), split_mod=5, band_size=4
    )


# --- wave 5: record linkage, quality-aware canonicals, tokenizer stats,
# --- embedding outliers ------------------------------------------------

from incubator_flink_old_spark.operators.similarity import centroid_outliers
from incubator_flink_old_spark.operators.text import (
    bpe_pair_counts,
    cluster_representatives,
    fuzzy_pairs,
)


@register(
    "q_fuzzy_dedup",
    oracle=r"""
    WITH n AS (
        SELECT p_name AS name, COUNT(*) AS cnt, MIN(p_partkey) AS rep
        FROM part GROUP BY 1),
    p AS (
        SELECT name, cnt, rep,
               list_filter(string_split_regex(lower(name), '\s+'),
                           x -> x <> '')[1] AS blk,
               length(name) // 4 AS b
        FROM n)
    SELECT a.name AS name_a, b.name AS name_b,
           a.rep AS rep_a, b.rep AS rep_b,
           a.cnt AS cnt_a, b.cnt AS cnt_b,
           CAST(levenshtein(a.name, b.name) AS INT) AS dist
    FROM p a JOIN p b
      ON a.blk = b.blk AND abs(a.b - b.b) <= 1 AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 4
    """,
)
def q_fuzzy_dedup(spark, sf_dir):
    """Fuzzy record linkage over part names: distinct-name collapse (the
    O(dups²) guard), (first-token, length-bucket) equi-join blocking with
    ±1-bucket probing, thresholded-levenshtein verify
    (operators/text.fuzzy_pairs)."""
    return fuzzy_pairs(
        t(spark, sf_dir, "part"), key="p_partkey", name="p_name", max_dist=4
    )


@register(
    "q_bpe_pairs",
    oracle=r"""
    WITH toks AS (
        SELECT list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS tka
        FROM documents),
    v AS (
        SELECT w, COUNT(*) AS c
        FROM (SELECT unnest(tka) AS w FROM toks)
        GROUP BY 1),
    pg AS (
        SELECT substring(w, i, 2) AS pair, c
        FROM v, unnest(generate_series(1, length(w) - 1)) u(i)
        WHERE length(w) >= 2)
    SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt
    FROM pg GROUP BY 1
    ORDER BY cnt DESC, pair
    LIMIT 20
    """,
)
def q_bpe_pairs(spark, sf_dir):
    """BPE-training inner statistic: top-20 adjacent character pairs over
    the word VOCABULARY (corpus collapses to (word, count) first — the
    pass scales with vocabulary, not corpus tokens), frequency-weighted,
    pair-text tie-break (operators/text.bpe_pair_counts)."""
    return bpe_pair_counts(t(spark, sf_dir, "documents"), top_n=20)


def _cluster_rep_oracle() -> str:
    """dedup_clusters' recursive-CTE twin extended with the quality score
    and a per-cluster (quality desc, doc_id) rank."""
    from incubator_flink_old_spark.queries.llm_ops import _minhash_oracle

    pairs_sql = _minhash_oracle(band_size=4).strip()
    return rf"""
    WITH RECURSIVE pairs AS MATERIALIZED ({pairs_sql}),
    sym AS MATERIALIZED (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(id, lbl) AS (
        SELECT src AS id, src AS lbl FROM sym
        UNION
        SELECT s.dst AS id, r.lbl
        FROM reach r JOIN sym s ON r.id = s.src
    ),
    comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id),
    cl AS (
        SELECT d.doc_id, COALESCE(comp.component, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN comp ON d.doc_id = comp.id),
    toks AS (
        SELECT doc_id,
               list_distinct(list_filter(
                   string_split_regex(lower(text), '\s+'), x -> x <> ''
               )) AS tk,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS tka
        FROM documents),
    qual AS (
        SELECT d.doc_id,
               0.5 * (CAST(len(list_filter(t.tka,
                   x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
                   / len(t.tka))
                 + 0.3 * (1.0 - (1.0 - CAST(len(t.tk) AS DOUBLE) / len(t.tka)))
                 + 0.2 * CAST(LENGTH(d.text) BETWEEN 100 AND 20000 AS DOUBLE)
                   AS quality
        FROM documents d JOIN toks t USING (doc_id)),
    r AS (
        SELECT cl.doc_id, cl.cluster_id, q.quality,
               ROW_NUMBER() OVER (
                   PARTITION BY cl.cluster_id
                   ORDER BY q.quality DESC NULLS LAST, cl.doc_id
               ) AS rn
        FROM cl JOIN qual q USING (doc_id))
    SELECT doc_id, cluster_id, quality, rn = 1 AS is_rep FROM r
    """


@register("q_cluster_rep", oracle=_cluster_rep_oracle())
def q_cluster_rep(spark, sf_dir):
    """Quality-aware canonical selection: near-dup clusters keep their
    highest-quality member (quality desc, doc_id tie-break) instead of
    the arbitrary min-id (operators/text.cluster_representatives)."""
    return cluster_representatives(t(spark, sf_dir, "documents"), band_size=4)


@register(
    "q_embed_outliers",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    dims AS (
        SELECT label, i,
               CAST(SUM(CAST(v[i] AS DECIMAL(27,15))) AS DOUBLE)
                 / COUNT(*) AS m
        FROM e, unnest(generate_series(1, len(v))) u(i)
        GROUP BY 1, 2),
    cent AS (SELECT label, list(m ORDER BY i) AS c FROM dims GROUP BY 1),
    sc AS (
        SELECT e.vec_id, e.label,
               ROUND(list_dot_product(e.v, c.c)
                 / (sqrt(list_dot_product(e.v, e.v))
                    * sqrt(list_dot_product(c.c, c.c))), 6) AS centroid_cos
        FROM e JOIN cent c ON e.label = c.label)
    SELECT vec_id, label, centroid_cos,
           centroid_cos < 0.0 AS is_outlier
    FROM sc
    """,
)
def q_embed_outliers(spark, sf_dir):
    """Embedding outlier gate: cosine of every vector to its group
    centroid, below-zero flagged — the cheap CLIP-score-style quality
    filter. Centroids build from one combinable (label, pos) aggregation
    over DECIMAL(27,15)-cast partial sums (partition-order-independent,
    same contract as dsum) and broadcast back; the corpus is never
    shuffled (operators/similarity.centroid_outliers)."""
    return centroid_outliers(
        t(spark, sf_dir, "embeddings"), group="label", key="vec_id"
    )
