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
