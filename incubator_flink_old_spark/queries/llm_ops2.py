"""Training-data pipeline queries, wave 2 (north-star W7 extensions):
near-dup CLUSTERING (the dedup decision), document chunking, stratified
sampling. All pure Column expressions with exact DuckDB twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_flink_old_spark.operators.text import (
    chunk_documents,
    dedup_clusters,
    sample_stratified,
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
