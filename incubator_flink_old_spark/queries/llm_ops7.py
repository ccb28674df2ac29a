"""Training-data pipeline queries, wave 13: sorted-neighborhood record
linkage, TF-IDF document keywords, event transition matrix. All pure
Column expressions with exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import t


@register(
    "q_sorted_neighborhood",
    oracle="""
    WITH r AS (
        SELECT c_name,
               ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS rn
        FROM customer)
    SELECT a.c_name AS name_a, b.c_name AS name_b,
           levenshtein(a.c_name, b.c_name) AS dist
    FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 2
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def q_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood record linkage
    (operators/text.sorted_neighborhood_pairs) — the sort-based
    alternative to LSH blocking: rank records by name (distributed
    global_row_number, no single-task window), compare each record only
    to its window−1 successors (candidate volume exactly (w−1)·n,
    linear by construction), verify with edit distance ≤ 2. The oracle
    is the single-threaded ROW_NUMBER formulation."""
    from incubator_flink_old_spark.operators.text import sorted_neighborhood_pairs

    cust = t(spark, sf_dir, "customer")
    return sorted_neighborhood_pairs(
        cust, key="c_custkey", name="c_name", window=3, max_distance=2
    )


@register(
    "q_tfidf_top_terms",
    oracle=r"""
    WITH tk AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> x <> '')) AS w
        FROM documents),
    tf AS (SELECT doc_id, w, COUNT(*) AS c FROM tk GROUP BY doc_id, w),
    m AS (
        SELECT doc_id, w, c,
               SUM(c) OVER (PARTITION BY doc_id) AS doc_len,
               COUNT(*) OVER (PARTITION BY w) AS df_t,
               (SELECT COUNT(DISTINCT doc_id) FROM tf) AS n
        FROM tf),
    sc AS (
        SELECT doc_id, w AS term,
               ROUND((CAST(c AS DOUBLE) / doc_len)
                     * LN(CAST(n AS DOUBLE) / df_t), 6) AS tfidf,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id
                   ORDER BY (CAST(c AS DOUBLE) / doc_len)
                            * LN(CAST(n AS DOUBLE) / df_t) DESC, w
               ) AS rk
        FROM m)
    SELECT doc_id, term, tfidf FROM sc WHERE rk <= 3
    """,
)
def q_tfidf_top_terms(spark, sf_dir):
    """Per-document TF-IDF keywords (the classic document-
    characterization pass): top-3 terms by (tf/len)·ln(N/df), ties by
    term. Document length, document frequency and the corpus size all
    derive from the SAME (doc, term) count frame via windows — the
    token stream is exploded and shuffled exactly once; everything
    after runs on the vocabulary-sized aggregate."""
    docs = t(spark, sf_dir, "documents")
    from incubator_flink_old_spark.operators.text import tokens

    tk = docs.select("doc_id", F.explode(tokens("text")).alias("w"))
    tf = tk.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    # marginals WITHOUT a global window: doc_len rides a doc-keyed
    # window; document frequency is a vocab-sized groupBy broadcast
    # back; the corpus size N is a scalar aggregate cross-joined as a
    # one-row broadcast. (A collect_set over an unpartitioned window
    # here cost 28 s at sf0.1 — one task building a set per row.)
    df_t = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df_t"))
    n_row = tf.agg(F.count_distinct("doc_id").alias("n"))
    m = (
        tf.withColumn(
            "doc_len", F.sum("c").over(Window.partitionBy("doc_id"))
        )
        .join(F.broadcast(df_t), on="w")
        .crossJoin(F.broadcast(n_row))
    )
    tfidf = (F.col("c").cast("double") / F.col("doc_len")) * F.log(
        F.col("n").cast("double") / F.col("df_t")
    )
    ranked = m.select(
        "doc_id",
        F.col("w").alias("term"),
        F.round(tfidf, 6).alias("tfidf"),
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy(tfidf.desc(), "w"))
        .alias("rk"),
    )
    return ranked.filter(F.col("rk") <= 3).select("doc_id", "term", "tfidf")


@register(
    "q_event_transitions",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events),
    c AS (
        SELECT event_type AS src_type, nxt AS dst_type, COUNT(*) AS n
        FROM o WHERE nxt IS NOT NULL
        GROUP BY event_type, nxt)
    SELECT src_type, dst_type, n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY src_type), 6) AS p
    FROM c
    """,
)
def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (the product-analytics "what happens next" view): one
    entity-keyed window for the successor, one combinable count, and
    row-normalization via a window over the |types|²-sized matrix —
    the event stream shuffles once."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    c = o.groupBy(
        F.col("event_type").alias("src_type"), F.col("nxt").alias("dst_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    p = F.col("n").cast("double") / F.sum("n").over(
        Window.partitionBy("src_type")
    )
    return c.select("src_type", "dst_type", "n", F.round(p, 6).alias("p"))


@register(
    "q_feature_hashing",
    oracle=r"""
    WITH tk AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> x <> '')) AS w
        FROM documents),
    b AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(w), 1, 15))::BIGINT % 16 AS INTEGER)
                   AS bucket
        FROM tk)
    SELECT doc_id, bucket, COUNT(*) AS c
    FROM b GROUP BY doc_id, bucket
    """,
)
def q_feature_hashing(spark, sf_dir):
    """The hashing trick (vocabulary-free vectorization for ML
    featurization): token counts folded into 16 hash buckets per
    document — explode → bucket → one combinable (doc, bucket) count,
    dimensionality fixed regardless of vocabulary growth. The bucket
    hash is the engine-portable md5 idiom (conv of the first 15 hex
    chars, mod buckets) rather than each engine's native hash —
    xxhash64 and DuckDB's hash() disagree, so only a shared hash makes
    the assignment oracle-replayable."""
    from incubator_flink_old_spark.operators.text import tokens

    docs = t(spark, sf_dir, "documents")
    tk = docs.select("doc_id", F.explode(tokens("text")).alias("w"))
    bucket = (
        F.conv(F.substring(F.md5(F.encode(F.col("w"), "UTF-8")), 1, 15), 16, 10)
        .cast("long")
        % 16
    ).cast("int")
    return (
        tk.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _dataset_split_oracle() -> str:
    from incubator_flink_old_spark.queries._util import split_case_sql

    return f"""
    SELECT doc_id, lang, {split_case_sql()} AS split
    FROM documents
    """


@register("q_dataset_split", oracle=_dataset_split_oracle())
def q_dataset_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment by the portable
    md5-Bernoulli bucket — the split is a PROPERTY of the row key, so
    it is stable across runs, engines, partitionings and even dataset
    versions (a document keeps its split when the corpus grows — the
    leakage-safety property rand()-based splits lack). Map-only. The
    split law lives ONCE in _util.split_col/split_case_sql, shared with
    the q_split_leakage and q_ks_drift audits so they can never drift
    from the split the pipeline actually ships."""
    from incubator_flink_old_spark.queries._util import split_col

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    return docs.select("doc_id", "lang", split_col("doc_id").alias("split"))
