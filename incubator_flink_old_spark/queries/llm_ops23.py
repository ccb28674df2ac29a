"""Training-data pipeline queries, wave 37: the curation AUDIT — for
every document, WHICH gate rejects it (or 'kept'). q_curate_full ships
the survivors; production also has to answer "why did doc X disappear"
and "which gate is eating my corpus" (the rejection histogram is the
first thing a curation dashboard shows). This query labels every doc
with the FIRST failing gate in the pipeline's own order, composing the
same operators q_curate_full runs — lang allowlist, benchmark
exclusion, exact-dup canonicalization, quality, repetition,
decontamination — each of which already has an independently verified
SQL twin (q_text_quality, q_text_repetition, q_decontaminate,
q_text_fingerprint).

Scope note — TWO of curate()'s eight stages are deliberately outside
the audit, both for stated reasons: (1) the near-dup (MinHash cluster)
gate — its SQL twin is the 3.57M-pair closure that q_dedup_cluster
carries; folding it here would make every audit run pay the pair DAG
(near-dup rejections are q_dedup_cluster's keep column); (2) the
per-domain CAP — it is a keep-QUOTA over survivors (rank within
domain), not a property of the document itself, so "first failing
gate" is not well-defined for it (a capped doc would have been kept
had its domain been emptier; q_domain_cap exposes the ranks directly).
The audit covers the six doc-intrinsic gates. Documented, not hidden.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import t

_LANGS = ("en", "de", "fr")
_BENCH_MOD = 97

_AUDIT_ORACLE = rf"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS tka
        FROM documents),
    fp AS (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents),
    canon AS (SELECT fp, MIN(doc_id) AS canon FROM fp GROUP BY fp),
    exact AS (
        SELECT f.doc_id, f.doc_id = c.canon AS is_canon
        FROM fp f JOIN canon c ON f.fp = c.fp),
    qual AS (
        -- the (1.0 - (1.0 - ttr)) double negation is NOT simplified to
        -- ttr: the operator computes it that way, and at the exact 0.4
        -- boundary the one-ulp difference flips the gate (3 sf0.1 docs
        -- sit precisely on quality = 0.4 — found by the sf0.1 sweep)
        SELECT d.doc_id,
               (0.5 * (CAST(len(list_filter(t.tka,
                    x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
                    / len(t.tka))
                + 0.3 * (1.0 - (1.0 - CAST(len(list_distinct(t.tka))
                    AS DOUBLE) / len(t.tka)))
                + 0.2 * CAST(LENGTH(d.text) BETWEEN 100 AND 20000
                    AS DOUBLE)) >= 0.4 AS kq
        FROM documents d JOIN toks t USING (doc_id)),
    g2 AS (
        SELECT doc_id, tka[i] || ' ' || tka[i + 1] AS g
        FROM toks, unnest(generate_series(1, len(tka) - 1)) u(i)
        WHERE len(tka) >= 2),
    c2 AS (
        SELECT doc_id, MAX(c) AS m2
        FROM (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2)
        GROUP BY doc_id),
    g5 AS (
        SELECT doc_id, array_to_string(list_slice(tka, i, i + 4), ' ') AS g
        FROM toks, unnest(generate_series(1, len(tka) - 4)) u(i)
        WHERE len(tka) >= 5),
    c5 AS (
        SELECT doc_id,
               SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS d5,
               SUM(c) AS t5
        FROM (SELECT doc_id, g, COUNT(*) AS c FROM g5 GROUP BY 1, 2)
        GROUP BY doc_id),
    rep AS (
        SELECT t.doc_id,
               COALESCE(2.0 * c2.m2 / len(t.tka), 0.0) <= 0.2
                 AND COALESCE(CAST(c5.d5 AS DOUBLE) / c5.t5, 0.0) <= 0.3
                   AS kr
        FROM toks t
        LEFT JOIN c2 ON t.doc_id = c2.doc_id
        LEFT JOIN c5 ON t.doc_id = c5.doc_id),
    bg AS (
        SELECT DISTINCT array_to_string(list_slice(tka, i, i + 7), ' ') AS g
        FROM toks, unnest(generate_series(1, len(tka) - 7)) u(i)
        WHERE doc_id % {_BENCH_MOD} = 0 AND len(tka) >= 8),
    dg AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(tka, i, i + 7), ' ') AS g
        FROM toks, unnest(generate_series(1, len(tka) - 7)) u(i)
        WHERE len(tka) >= 8),
    contam AS (
        SELECT doc_id, COUNT(*) > 0 AS kc
        FROM dg WHERE g IN (SELECT g FROM bg)
        GROUP BY doc_id)
    SELECT d.doc_id,
           CASE
               WHEN d.lang NOT IN ('en', 'de', 'fr') THEN 'lang'
               WHEN d.doc_id % {_BENCH_MOD} = 0 THEN 'benchmark'
               WHEN NOT e.is_canon THEN 'exact_dup'
               WHEN NOT q.kq THEN 'quality'
               WHEN NOT r.kr THEN 'repetition'
               WHEN COALESCE(c.kc, FALSE) THEN 'contaminated'
               ELSE 'kept'
           END AS verdict
    FROM documents d
    JOIN exact e ON d.doc_id = e.doc_id
    JOIN qual q ON d.doc_id = q.doc_id
    JOIN rep r ON d.doc_id = r.doc_id
    LEFT JOIN contam c ON d.doc_id = c.doc_id
    """


@register("q_curation_audit", oracle=_AUDIT_ORACLE)
def q_curation_audit(spark, sf_dir):
    """Curation REJECTION AUDIT: every document labelled with the first
    gate that rejects it, in q_curate_full's own gate order — lang →
    benchmark-exclusion → exact-dup (non-canonical copy) → quality →
    repetition → contamination → 'kept'. GROUP BY verdict on this
    output is the rejection histogram every curation dashboard leads
    with; filtering verdict='quality' answers "show me what the quality
    gate is eating" without re-running the pipeline.

    Composes the SAME operators the pipeline runs (fingerprint,
    quality_score, repetition_metrics, decontaminate), each with an
    independently verified SQL twin — the audit oracle is their
    composition under a CASE. Out of audit scope BY DESIGN (module
    docstring): the near-dup gate (its verdict lives in
    q_dedup_cluster, whose SQL twin is the pair-closure this audit
    must not pay) and the per-domain cap (a keep-quota over survivors,
    not a doc-intrinsic gate — q_domain_cap exposes the ranks).

    Scale: every gate is one doc-keyed frame (co-partitioned joins, no
    corpus-dimension windows); the decontamination side is a broadcast
    of benchmark grams. Cost ≈ sum of the individual gate queries —
    O(corpus), the same bound q_curate_full carries."""
    from incubator_flink_old_spark.operators.text import (
        decontaminate,
        fingerprint,
        quality_score,
        repetition_metrics,
    )

    docs = t(spark, sf_dir, "documents")
    fp = fingerprint(docs)
    canon = fp.groupBy("fp").agg(F.min("doc_id").alias("canon"))
    exact = (
        fp.join(canon, on="fp")
        .select("doc_id", (F.col("doc_id") == F.col("canon")).alias("is_canon"))
    )
    qual = quality_score(docs).select("doc_id", F.col("keep").alias("kq"))
    rep = repetition_metrics(docs).select(
        "doc_id", F.col("keep_repetition").alias("kr")
    )
    dec = decontaminate(
        docs, docs.filter(F.col("doc_id") % _BENCH_MOD == 0), n=8
    ).select("doc_id", F.col("contaminated").alias("kc"))

    verdict = (
        F.when(~F.col("lang").isin(*_LANGS), "lang")
        .when(F.col("doc_id") % _BENCH_MOD == 0, "benchmark")
        .when(~F.col("is_canon"), "exact_dup")
        .when(~F.col("kq"), "quality")
        .when(~F.col("kr"), "repetition")
        .when(F.coalesce(F.col("kc"), F.lit(False)), "contaminated")
        .otherwise("kept")
    )
    return (
        docs.select("doc_id", "lang")
        .join(exact, on="doc_id")
        .join(qual, on="doc_id")
        .join(rep, on="doc_id")
        .join(dec, on="doc_id", how="left")
        .select("doc_id", verdict.alias("verdict"))
    )
