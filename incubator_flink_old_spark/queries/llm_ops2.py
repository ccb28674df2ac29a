"""Training-data pipeline queries, wave 2 (north-star W7 extensions):
near-dup CLUSTERING (the dedup decision), document chunking, stratified
sampling. All pure Column expressions with exact DuckDB twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_flink_old_spark.operators.text import (
    chunk_documents,
    dedup_clusters,
    sample_stratified,
    training_corpus,
)
from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import t
from incubator_flink_old_spark.queries.llm_ops import _minhash_oracle


def _dedup_cluster_oracle() -> str:
    """MinHash pair list (band_size=4, jac≥0.7 — same as q_dedup_minhash)
    → symmetric closure → recursive min-label reachability → per-doc
    cluster assignment with singletons mapping to themselves."""
    pairs_sql = _minhash_oracle(band_size=4).strip()
    return f"""
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
    comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id)
    SELECT d.doc_id,
           COALESCE(comp.component, d.doc_id) AS cluster_id,
           d.doc_id = COALESCE(comp.component, d.doc_id) AS keep
    FROM documents d LEFT JOIN comp ON d.doc_id = comp.id
    """


@register("q_dedup_cluster", oracle=_dedup_cluster_oracle())
def q_dedup_cluster(spark, sf_dir):
    """Near-dup clustering: MinHash-LSH pair list → delta-iteration
    connected components → one canonical (min-id) doc kept per cluster —
    the composed end-to-end dedup decision over the engine's own
    primitives (operators/text.dedup_clusters)."""
    return dedup_clusters(t(spark, sf_dir, "documents"), band_size=4)


@register(
    "q_text_chunks",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS tka
        FROM documents),
    starts AS (
        SELECT doc_id, tka,
               unnest(generate_series(1, greatest(len(tka) - 8, 1), 24)) AS s
        FROM toks)
    SELECT doc_id,
           CAST((s - 1) // 24 AS INT) AS chunk_idx,
           array_to_string(list_slice(tka, s, s + 31), ' ') AS chunk_text,
           len(list_slice(tka, s, s + 31)) AS n_chunk_tokens
    FROM starts
    """,
)
def q_text_chunks(spark, sf_dir):
    """Context-window chunking: 32-token windows, 8-token overlap
    (stride 24), tail-covering start sequence — sequence/transform/
    posexplode, fully JVM-side (operators/text.chunk_documents)."""
    return chunk_documents(
        t(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    )


@register(
    "q_training_corpus",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS tka,
               list_distinct(list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '')) AS tk
        FROM documents),
    fp AS (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents),
    canon AS (SELECT fp, MIN(doc_id) AS canon_id FROM fp GROUP BY fp),
    q AS (
        SELECT t.doc_id,
               0.5 * (CAST(len(list_filter(t.tka,
                         x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
                      / len(t.tka))
                 + 0.3 * (1.0 - (1.0 - CAST(len(t.tk) AS DOUBLE) / len(t.tka)))
                 + 0.2 * CAST(LENGTH(d.text) BETWEEN 100 AND 20000 AS DOUBLE)
                   AS quality
        FROM toks t JOIN documents d USING (doc_id))
    SELECT d.doc_id, d.lang, d.n_chars, ROUND(q.quality, 6) AS quality
    FROM documents d
    JOIN fp USING (doc_id)
    JOIN canon ON fp.fp = canon.fp AND d.doc_id = canon.canon_id
    JOIN q USING (doc_id)
    WHERE q.quality >= 0.4 AND d.lang IN ('en', 'de', 'fr')
    """,
)
def q_training_corpus(spark, sf_dir):
    """End-to-end training-set materialization: exact dedup (min-id doc
    per md5 fingerprint) ∩ heuristic quality keep ∩ language allowlist —
    the composed curation pipeline over the engine's own primitives
    (operators/text.training_corpus)."""
    return training_corpus(t(spark, sf_dir, "documents"))


@register(
    "q_sample_stratified",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 1000000
          < CAST((CASE lang WHEN 'en' THEN 0.5
                            WHEN 'de' THEN 0.25
                            ELSE 0.1 END) * 1000000 AS BIGINT)
    """,
)
def q_sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling: per-language Bernoulli keyed on
    a portable md5 hash — reproducible across engines/runs/partitionings
    and shuffle-free (broadcast fractions dim + pure Column predicate)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return sample_stratified(
        docs,
        strata="lang",
        fractions={"en": 0.5, "de": 0.25},
        key="doc_id",
        default_fraction=0.1,
    )
