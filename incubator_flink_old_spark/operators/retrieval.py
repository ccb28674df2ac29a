"""Retrieval / language-model scoring operators (W7 family, SURVEY §2.11):
BM25 ranked retrieval and bigram-LM document scoring.

These are the classic text-retrieval companions to the TF-IDF keyword
pass (`queries/llm_ops7.q_tfidf_top_terms`): BM25 ranks documents for a
query term set (the standard relevance baseline every retrieval stack
reports against), and the add-one-smoothed bigram LM assigns each
document a mean log-probability under a corpus-trained model — the
cheap, deterministic stand-in for perplexity-based quality filtering
(KenLM-style) over a training corpus.

Scale shape (both): the token stream is exploded and shuffled ONCE into
vocabulary-sized count tables; everything afterwards is joins keyed by
token/bigram (co-partitioned at scale, broadcast at test sf) plus
one-row scalar broadcasts. No Python workers, no windows over the
corpus, no global sorts — BM25's final top-k is a TakeOrdered.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incubator_flink_old_spark.operators.text import tokens


def bm25_index_stats(
    df: DataFrame,
    terms: tuple[str, ...],
    text: str = "text",
    key: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Per-SOURCE BM25 index statistics in their mergeable (raw-count)
    form: a 1-row (n docs, toks tokens) frame and a per-term (w, dft)
    document-frequency frame. These are the corpus-level numbers a
    lexical index maintains; per-document postings (tf, dl) never need
    merging — appending a delta batch is a map-only postings write plus
    THIS digest-sized stats merge (:func:`merge_bm25_stats`), the exact
    lexical analog of the IVF layout's frozen-center delta assignment."""
    tk = df.select(F.col(key), F.explode(tokens(text)).alias("w"))
    tf = tk.groupBy(key, "w").agg(F.count(F.lit(1)).alias("tf"))
    counts = df.agg(F.count(F.lit(1)).alias("n")).crossJoin(
        tk.agg(F.count(F.lit(1)).alias("toks"))
    )
    dft = (
        tf.filter(F.col("w").isin(list(terms)))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("dft"))
    )
    return counts, dft


def merge_bm25_stats(
    *stats: tuple[DataFrame, DataFrame],
) -> tuple[DataFrame, DataFrame]:
    """Merge per-source index statistics into the (scalars, dft) pair
    :func:`bm25_topk` scores with. Counts merge by integer SUM — exact —
    and avgdl is computed from the merged longs, so the merged result is
    BIT-IDENTICAL to recomputing over the union corpus (law-pinned in
    tests/test_wave41.py; the merged sums are the same integers, and
    toks/n divides the same operands)."""
    counts = stats[0][0]
    dft = stats[0][1]
    for c, d in stats[1:]:
        counts = counts.unionByName(c)
        dft = dft.unionByName(d)
    scalars = counts.agg(
        F.sum("n").alias("n"), F.sum("toks").alias("toks")
    ).select(
        "n",
        # Non-empty-corpus precondition made explicit: n=0 would yield a
        # NULL avgdl that silently NULLs every downstream bm25 score —
        # raise at execution time instead (ADVICE r07).
        F.when(
            F.col("n") > 0, F.col("toks").cast("double") / F.col("n")
        )
        .otherwise(
            F.raise_error(
                F.lit("merge_bm25_stats: merged corpus is empty (n=0)")
            )
        )
        .alias("avgdl"),
    )
    dft = dft.groupBy("w").agg(F.sum("dft").alias("dft"))
    return scalars, dft


def streaming_bm25_stats(
    stream: DataFrame,
    terms: tuple[str, ...],
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """BM25 corpus statistics maintained LIVE over a document stream —
    the lexical tier's streaming absorption (grid_assign_map: IVF,
    grid_pq_encode_map: PQ, sq8_encode_map: SQ8, prefix_encode_map:
    prefix — this closes the family): each arriving document contributes
    its digest row MAP-SIDE (1 doc, dl tokens, one contains-flag per
    query term — per-doc postings never cross documents), and a single
    streaming global aggregation SUMS them. Every statistic is an
    integer sum (a commutative monoid), so the aggregate's final state
    is EXACTLY :func:`bm25_index_stats` over all streamed documents
    whatever the microbatch boundaries — the same mergeability
    :func:`merge_bm25_stats` rides, continuous instead of batched.

    Returns the 1-row aggregate (n, toks, dft_0..dft_{len(terms)-1}) —
    run it in "complete" output mode so the sink always holds the
    current corpus statistics. Scale: state is ONE row of longs
    forever; per micro-batch cost is a map over the batch's documents
    plus a 1-row combine — the live lexical index's stats maintenance
    at ingest throughput, with per-doc postings landing as map-only
    writes beside it."""
    if not terms:
        raise ValueError("streaming_bm25_stats requires at least one term")
    tks = tokens(text)
    per_doc = stream.select(
        F.size(tks).alias("__dl"),
        *[
            F.array_contains(tks, t).cast("long").alias(f"__h{i}")
            for i, t in enumerate(terms)
        ],
    )
    return per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__dl").alias("toks"),
        *[F.sum(f"__h{i}").alias(f"dft_{i}") for i in range(len(terms))],
    )


def bm25_topk(
    df: DataFrame,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    text: str = "text",
    key: str = "doc_id",
    index_stats: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """BM25 ranked retrieval: score every document containing at least
    one query term and return the ``top_k`` by total score.

    idf(t) = ln((N − df_t + 0.5)/(df_t + 0.5) + 1)  (the Lucene form —
    always positive), tf saturation k1, length normalization b against
    the corpus mean document length.

    Determinism note: the per-document total is a sum over ≤|terms|
    doubles, and float addition is fold-order dependent — so the sum is
    assembled as one conditional aggregate PER TERM (each reduces over
    at most one non-null value) combined left-to-right in the fixed
    ``terms`` order, identical on any engine/partitioning. Rounded 6dp.

    Output: (key, bm25) — the ``top_k`` rows by (bm25 desc, key), a
    distributed TakeOrdered, never a single-partition window.

    ``index_stats`` injects pre-merged corpus statistics (the
    (scalars, dft) pair from :func:`merge_bm25_stats`) instead of
    recomputing them from ``df`` — the incremental-index path. The
    merge is integer-exact, so the injected ranking is bit-identical
    to the recomputed one.
    """
    terms = tuple(terms)
    if not terms:
        raise ValueError("bm25_topk requires at least one query term")
    if len(set(terms)) != len(terms):
        raise ValueError("bm25_topk terms must be distinct")
    tk = df.select(F.col(key), F.explode(tokens(text)).alias("w"))
    tf = tk.groupBy(key, "w").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(key).agg(F.sum("tf").alias("dl"))
    qtf = tf.filter(F.col("w").isin(list(terms)))
    if index_stats is not None:
        scalars, dft = index_stats
    else:
        scalars = (
            df.agg(F.count(F.lit(1)).alias("n"))
            .crossJoin(tk.agg(F.count(F.lit(1)).alias("toks")))
            .select(
                "n", (F.col("toks").cast("double") / F.col("n")).alias("avgdl")
            )
        )
        dft = qtf.groupBy("w").agg(F.count(F.lit(1)).alias("dft"))
    idf = F.log(
        (F.col("n") - F.col("dft") + 0.5) / (F.col("dft") + 0.5) + 1.0
    )
    s = idf * (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        qtf.join(dl, on=key)
        .join(F.broadcast(dft), on="w")
        .crossJoin(F.broadcast(scalars))
        .select(key, "w", s.alias("s"))
    )
    per_term = scored.groupBy(key).agg(
        *[
            F.sum(F.when(F.col("w") == t_, F.col("s"))).alias(f"__s{i}")
            for i, t_ in enumerate(terms)
        ]
    )
    total = reduce(
        lambda acc, i: acc + F.coalesce(F.col(f"__s{i}"), F.lit(0.0)),
        range(len(terms)),
        F.lit(0.0),
    )
    return (
        per_term.select(key, F.round(total, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(key))
        .limit(top_k)
    )


def bm25_multi_topk(
    df: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    text: str = "text",
    key: str = "doc_id",
    q_key: str = "q_id",
    terms_col: str = "terms",
) -> DataFrame:
    """BM25 ranked retrieval for a BATCH OF QUERIES — the multi-query
    harness :func:`bm25_topk` (one fixed term tuple compiled into the
    plan) cannot express, and the missing piece for rank-aware index
    evaluation (MRR/recall need many queries, not one). ``queries`` is
    (q_key, terms array<string>); every query is scored against the
    corpus in ONE term-keyed join pass — the corpus is tokenized once,
    queries ride a |Σ terms|-row broadcast, and the per-(query, doc)
    score sum is a fold over the matched terms SORTED BY TERM, so the
    float addition order is a pure function of the term set — identical
    on any engine/partitioning (the bm25_topk fixed-order discipline,
    generalized to variable term sets). Same Lucene idf / k1 / b
    arithmetic as bm25_topk; a term no document contains simply
    contributes no row (its idf is never evaluated).

    Output: (q_key, key, bm25 rounded 6dp, rnk 1..top_k) — per-query
    top-k by (bm25 desc, key). Scale: one corpus tokenization shared by
    all queries; the scored frame is |queries| · |docs matching ≥1
    term| rows keyed by term then (query, doc) — the same digest-sized
    shuffles as single-query BM25, amortized across the whole eval
    batch; the per-query top-k is a window over each query's candidate
    set, never a global sort."""
    from pyspark.sql import Window

    qt = queries.select(
        F.col(q_key), F.explode(F.array_distinct(terms_col)).alias("w")
    )
    tk = df.select(F.col(key), F.explode(tokens(text)).alias("w"))
    tf = tk.groupBy(key, "w").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(key).agg(F.sum("tf").alias("dl"))
    scalars = (
        df.agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(tk.agg(F.count(F.lit(1)).alias("toks")))
        .select(
            "n", (F.col("toks").cast("double") / F.col("n")).alias("avgdl")
        )
    )
    dft = (
        tf.join(F.broadcast(qt.select("w").distinct()), on="w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("dft"))
    )
    s = F.log(
        (F.col("n") - F.col("dft") + 0.5) / (F.col("dft") + 0.5) + 1.0
    ) * (
        F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        F.broadcast(qt)
        .join(tf, on="w")
        .join(dl, on=key)
        .join(F.broadcast(dft), on="w")
        .crossJoin(F.broadcast(scalars))
        .select(q_key, key, "w", s.alias("s"))
    )
    per = scored.groupBy(q_key, key).agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("w", "s"))),
                F.lit(0.0),
                lambda acc, x: acc + x.getField("s"),
            ),
            6,
        ).alias("bm25")
    )
    wr = Window.partitionBy(q_key).orderBy(F.col("bm25").desc(), key)
    return (
        per.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= top_k)
        .select(q_key, key, "bm25", "rnk")
    )


def bigram_lm_scores(
    df: DataFrame, text: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Bigram language-model document scoring with add-one smoothing:
    train c(w1,w2) / c(w1) / |V| on the corpus itself, then score each
    document as the mean log-probability of its bigrams,

        score(d) = avg over bigrams of ln((c(w1,w2)+1) / (c(w1)+|V|)).

    The perplexity-filter stand-in: low scores flag documents whose
    word transitions the corpus model finds surprising (gibberish,
    wrong-language, template noise). Documents with fewer than two
    tokens emit no row (they have no bigrams to score).

    One explode feeds both the unigram and bigram count tables; the
    scoring pass re-joins the document bigram stream against those
    counts (token-keyed — co-partitioned at 100 TB, broadcast at test
    sf) and folds with a combinable AVG. Rounded 6dp (double reorder
    noise ~1e-14, the q_lm_score contract).

    Output: (key, n_bigrams, lm_bigram_score).
    """
    staged = df.select(F.col(key), tokens(text).alias("__tka")).filter(
        F.size("__tka") >= 2
    )
    # Explode start positions, index AFTER the Generate — sequence(1, 0)
    # would be a descending trap on 1-token docs, hence the filter above.
    bg = staged.select(
        key,
        F.explode(F.sequence(F.lit(1), F.size("__tka") - 1)).alias("i"),
        "__tka",
    ).select(
        key,
        F.element_at("__tka", F.col("i")).alias("w1"),
        F.element_at("__tka", F.col("i") + 1).alias("w2"),
    )
    uni = df.select(F.explode(tokens(text)).alias("w"))
    c1 = uni.groupBy(F.col("w").alias("w1")).agg(F.count(F.lit(1)).alias("c1"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    v = c1.agg(F.count(F.lit(1)).alias("v"))
    logp = F.log((F.col("c2") + 1).cast("double") / (F.col("c1") + F.col("v")))
    return (
        bg.join(c2, on=["w1", "w2"])
        .join(c1, on="w1")
        .crossJoin(F.broadcast(v))
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("lm_bigram_score"),
        )
    )
