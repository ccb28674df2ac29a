"""Training-data pipeline queries, wave 6: dataset-version diff,
cross-source contamination matrix, tokenizer application (token-id
encoding), and per-source data cards. All pure Column expressions with
exact DuckDB twins."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from incubator_flink_old_spark.operators.text import (
    corpus_diff,
    quality_score,
    source_overlap,
    token_count,
    tokenize_ids,
)
from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import t

#: DuckDB twin of operators.text.tokens() (non-distinct form)
_SQL_TKA = r"""
    SELECT doc_id, source,
           list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tka
    FROM documents
"""


@register(
    "q_corpus_diff",
    oracle="""
    WITH old AS (
        SELECT doc_id, md5(coalesce(text, '')) AS fp
        FROM documents WHERE doc_id % 7 <> 1),
    new AS (
        SELECT doc_id,
               md5(coalesce(
                   CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
                        ELSE text END, '')) AS fp
        FROM documents WHERE doc_id % 7 <> 2)
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.fp IS NULL THEN 'added'
                WHEN n.fp IS NULL THEN 'removed'
                WHEN o.fp <> n.fp THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    """,
)
def q_corpus_diff(spark, sf_dir):
    """Dataset-release diff: two deterministic snapshot views of the
    corpus (doc_id % 7 carve-outs simulate adds/removes, a ' [rev2]'
    suffix on doc_id % 5 = 0 simulates edits) classified added / removed
    / changed / unchanged via one full-outer fingerprint join — 32-byte
    digests shuffle, never payloads (operators/text.corpus_diff)."""
    docs = t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 1)
    new = docs.filter(F.col("doc_id") % 7 != 2).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        ).otherwise(F.col("text")),
    )
    return corpus_diff(old, new)


@register(
    "q_source_overlap",
    oracle=rf"""
    WITH toks AS ({_SQL_TKA}),
    g AS (
        SELECT DISTINCT source AS src,
               md5(array_to_string(list_slice(tka, i, i + 7), ' ')) AS gh
        FROM toks, unnest(generate_series(1, len(tka) - 7)) u(i)
        WHERE len(tka) >= 8),
    tot AS (SELECT src, COUNT(*) AS n_grams FROM g GROUP BY 1),
    sh AS (
        SELECT a.src AS source_a, b.src AS source_b, COUNT(*) AS shared_grams
        FROM g a JOIN g b ON a.gh = b.gh AND a.src < b.src
        GROUP BY 1, 2)
    SELECT sh.source_a, sh.source_b, sh.shared_grams,
           ROUND(sh.shared_grams / LEAST(ta.n_grams, tb.n_grams), 6)
               AS overlap_coef
    FROM sh
    JOIN tot ta ON sh.source_a = ta.src
    JOIN tot tb ON sh.source_b = tb.src
    """,
)
def q_source_overlap(spark, sf_dir):
    """Cross-source contamination matrix: distinct 8-gram fingerprints
    shared between every source pair + overlap coefficient — the
    release-audit companion to decontamination. One distinct shuffle,
    gram-key self-join with fan-out bounded by |sources|
    (operators/text.source_overlap)."""
    return source_overlap(t(spark, sf_dir, "documents"), n=8)


@register(
    "q_tokenize_ids",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS tka
        FROM documents),
    w AS (SELECT unnest(tka) AS tok FROM toks),
    vc AS (SELECT tok, COUNT(*) AS c FROM w GROUP BY 1),
    vocab AS (
        SELECT tok, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS tok_id
        FROM vc ORDER BY c DESC, tok LIMIT 1000),
    pos AS (
        SELECT doc_id, i, tka[i] AS tok
        FROM toks, unnest(generate_series(1, least(len(tka), 64))) u(i)),
    enc AS (
        SELECT p.doc_id,
               string_agg(CAST(COALESCE(v.tok_id, 0) AS VARCHAR),
                          ',' ORDER BY p.i) AS ids,
               COUNT(*) AS n_ids
        FROM pos p LEFT JOIN vocab v USING (tok)
        GROUP BY 1)
    SELECT d.doc_id, COALESCE(e.ids, '') AS ids,
           CAST(COALESCE(e.n_ids, 0) AS INT) AS n_ids
    FROM documents d LEFT JOIN enc e USING (doc_id)
    """,
)
def q_tokenize_ids(spark, sf_dir):
    """Tokenizer application: frequency-ranked top-1000 vocabulary
    (count desc, token asc; OOV → 0) broadcast onto each document's
    64-token prefix; ids reassemble position-sorted into a CSV string
    (operators/text.tokenize_ids)."""
    return tokenize_ids(t(spark, sf_dir, "documents"), vocab_size=1000, max_len=64)


@register(
    "q_data_card",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS tka,
               list_distinct(list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '')) AS tk
        FROM documents),
    q AS (
        SELECT d.doc_id, d.source, d.lang, len(t.tka) AS n_tokens,
               ROUND(
                 0.5 * (CAST(len(list_filter(t.tka,
                     x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
                     / len(t.tka))
                   + 0.3 * (1.0 - (1.0 - CAST(len(t.tk) AS DOUBLE) / len(t.tka)))
                   + 0.2 * CAST(LENGTH(d.text) BETWEEN 100 AND 20000 AS DOUBLE),
                 6) AS quality
        FROM documents d JOIN toks t USING (doc_id)),
    stats AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               ROUND(CAST(SUM(CAST(quality AS DECIMAL(27,6))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_quality,
               COUNT(DISTINCT lang) AS n_langs
        FROM q GROUP BY 1),
    lc AS (
        SELECT source, lang, COUNT(*) AS c,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY COUNT(*) DESC, lang
               ) AS rn
        FROM q GROUP BY 1, 2)
    SELECT s.source, s.n_docs, s.n_tokens, s.mean_quality, s.n_langs,
           lc.lang AS top_lang
    FROM stats s JOIN lc ON s.source = lc.source AND lc.rn = 1
    """,
)
def q_data_card(spark, sf_dir):
    """Per-source data card: docs, total tokens, mean quality
    (decimal-summed on both engines — partition-order-independent),
    language count and modal language (count desc, lang asc tie-break)
    — the release-notes aggregation a dataset ships with. Two shuffles
    total: one stats agg, one (source, lang) mode agg."""
    docs = t(spark, sf_dir, "documents")
    q = quality_score(docs).select(
        "doc_id", F.round("quality", 6).alias("quality")
    )
    base = docs.select(
        "doc_id", "source", "lang", token_count("text").alias("n_tokens")
    ).join(q, on="doc_id")
    stats = base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(
            F.sum(F.col("quality").cast("decimal(27,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_quality"),
        F.count_distinct("lang").alias("n_langs"),
    )
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), "lang")
    top = (
        base.groupBy("source", "lang")
        .agg(F.count("*").alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return stats.join(top, on="source")


# --- wave 7: structural-template dedup, end-to-end entity resolution ----

from incubator_flink_old_spark.operators.text import resolve_entities, template_dedup


@register(
    "q_template_dedup",
    oracle=r"""
    WITH base AS (
        SELECT event_id,
               md5(trim(regexp_replace(regexp_replace(
                   lower(coalesce(props, '')), '[0-9]+', '#', 'g'),
                   '\s+', ' ', 'g'))) AS tpl_fp
        FROM events),
    g AS (
        SELECT tpl_fp, COUNT(*) AS group_size, MIN(event_id) AS template_id
        FROM base GROUP BY 1 HAVING COUNT(*) >= 2)
    SELECT b.event_id, g.template_id, g.group_size
    FROM base b JOIN g USING (tpl_fp)
    """,
)
def q_template_dedup(spark, sf_dir):
    """Template/boilerplate detection: structural fingerprints (digit
    runs → '#', whitespace collapsed) group same-template payloads with
    different fill-ins — the duplication class exact hashing misses.
    Runs on the events.props JSON payloads, where the fixture genuinely
    IS templated (the documents table's random token text correctly
    yields zero template groups — asserted in pytest)
    (operators/text.template_dedup)."""
    return template_dedup(t(spark, sf_dir, "events"), text="props", key="event_id")


@register(
    "q_entity_resolve",
    oracle=r"""
    WITH RECURSIVE n AS (
        SELECT p_name AS name, MIN(p_partkey) AS rep FROM part GROUP BY 1),
    p AS (
        SELECT name, rep,
               list_filter(string_split_regex(lower(name), '\s+'),
                           x -> x <> '')[1] AS blk,
               length(name) // 4 AS b
        FROM n),
    e AS (
        SELECT a.rep AS src, b.rep AS dst
        FROM p a JOIN p b
          ON a.blk = b.blk AND abs(a.b - b.b) <= 1 AND a.name < b.name
        WHERE levenshtein(a.name, b.name) <= 4),
    sym AS MATERIALIZED (
        SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    reach(id, lbl) AS (
        SELECT src AS id, src AS lbl FROM sym
        UNION
        SELECT s.dst AS id, r.lbl
        FROM reach r JOIN sym s ON r.id = s.src),
    comp AS (SELECT id, MIN(lbl) AS c FROM reach GROUP BY id)
    SELECT n.name, n.rep, COALESCE(comp.c, n.rep) AS entity_id
    FROM n LEFT JOIN comp ON n.rep = comp.id
    """,
)
def q_entity_resolve(spark, sf_dir):
    """End-to-end entity resolution over part names: fuzzy-linkage edges
    → delta-iteration connected components → min-rep entity ids, the
    record-linkage decision composed from the engine's own primitives
    (operators/text.resolve_entities); recursive-CTE oracle."""
    return resolve_entities(t(spark, sf_dir, "part"), key="p_partkey", name="p_name")


# --- wave 8: privacy release audit, contrastive negative sampling ------

from incubator_flink_old_spark.operators.text import k_anonymity, negative_samples


@register(
    "q_k_anonymity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           COUNT(*) AS class_size,
           COUNT(*) >= 5 AS k_ok
    FROM customer GROUP BY 1, 2
    """,
)
def q_k_anonymity(spark, sf_dir):
    """Privacy release audit: equivalence-class sizes over the
    (nationkey, mktsegment) quasi-identifier tuple with the k=5 policy
    flag — the generalize-or-suppress worklist a release pipeline
    produces (operators/text.k_anonymity). One combinable hash groupBy."""
    return k_anonymity(
        t(spark, sf_dir, "customer"), quasi=("c_nationkey", "c_mktsegment"), k=5
    )


@register(
    "q_negative_sampling",
    oracle="""
    WITH b AS (
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 64 AS bk
        FROM documents),
    q AS (
        SELECT doc_id AS q_id, j, (bk + j) % 64 AS bk2
        FROM b, unnest(generate_series(1, 4)) u(j)
        WHERE doc_id % 17 = 0)
    SELECT q.q_id, CAST(q.j AS INT) AS j,
           arg_min(c.doc_id,
                   md5(CAST(q.q_id AS VARCHAR) || '|'
                       || CAST(c.doc_id AS VARCHAR))) AS neg_id
    FROM q JOIN b c ON q.bk2 = c.bk
    WHERE c.doc_id <> q.q_id
    GROUP BY q.q_id, q.j
    """,
)
def q_negative_sampling(spark, sf_dir):
    """Deterministic contrastive negative sampling: every 17th document
    draws 4 negatives, one from each of the next 4 hash-ring buckets,
    arg-min'd on a portable (query, candidate) md5 pair hash — an
    equi-join on the bucket (k/64 of the corpus per query; partition-
    pruned under a bucket-partitioned layout), never a crossJoin
    (operators/text.negative_samples)."""
    docs = t(spark, sf_dir, "documents")
    return negative_samples(
        docs, F.col("doc_id") % 17 == 0, k=4, num_buckets=64
    )
