"""Wave-5 operator tests: fuzzy record linkage, BPE tokenizer training,
quality-aware cluster representatives, embedding centroid outliers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_flink_old_spark.operators.similarity import centroid_outliers
from incubator_flink_old_spark.operators.text import (
    bpe_learn,
    bpe_pair_counts,
    cluster_representatives,
    fuzzy_pairs,
)
from incubator_flink_old_spark.sources import load_table


# ---------------------------------------------------------------- fuzzy


def test_fuzzy_pairs_blocked_equals_naive(spark, sf_dir):
    """±1-bucket probing loses nothing: blocked output == naive
    first-token-blocked all-pairs at the same threshold."""
    part = load_table(spark, sf_dir, "part")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_pairs(part, max_dist=4).collect()
    }
    names = part.groupBy(F.col("p_name").alias("name")).count()
    a = names.select(
        F.col("name").alias("na"),
        F.element_at(F.split(F.lower("name"), r"\s+"), 1).alias("blk"),
    )
    b = names.select(
        F.col("name").alias("nb"),
        F.element_at(F.split(F.lower("name"), r"\s+"), 1).alias("blk"),
    )
    naive = {
        (r["na"], r["nb"], r["d"])
        for r in a.join(b, on="blk")
        .filter(F.col("na") < F.col("nb"))
        .select("na", "nb", F.levenshtein("na", "nb").alias("d"))
        .filter(F.col("d") <= 4)
        .collect()
    }
    assert got == naive and got


def test_fuzzy_pairs_counts_and_reps(spark, sf_dir):
    """Pair rows carry the exact-duplicate group sizes and min-key reps —
    row-level linkage is reconstructable without O(dups²) pairing."""
    part = load_table(spark, sf_dir, "part")
    out = fuzzy_pairs(part, max_dist=4)
    row = out.orderBy("name_a", "name_b").first()
    if row is not None:
        cnt = part.filter(F.col("p_name") == row["name_a"]).count()
        rep = (
            part.filter(F.col("p_name") == row["name_a"])
            .agg(F.min("p_partkey"))
            .first()[0]
        )
        assert row["cnt_a"] == cnt and row["rep_a"] == rep


def test_fuzzy_pairs_bucket_guard(spark, sf_dir):
    with pytest.raises(ValueError):
        fuzzy_pairs(load_table(spark, sf_dir, "part"), max_dist=5, bucket_width=4)


# ------------------------------------------------------------------ bpe


def _py_vocab(texts):
    from collections import Counter

    v = Counter()
    for t in texts:
        for w in t.lower().split():
            v[w] += 1
    return v


def _py_bpe(texts, num_merges):
    """Reference BPE with the operator's tie-break (count desc, pair asc)."""
    from collections import Counter

    vocab = {w: (list(w), c) for w, c in _py_vocab(texts).items()}
    merges = []
    for _ in range(num_merges):
        counts = Counter()
        for syms, c in vocab.values():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        a, b = pair
        for w, (syms, c) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (out, c)
    return merges, {w: syms for w, (syms, c) in vocab.items()}


TINY = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
]


def test_bpe_pair_counts_matches_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TINY)], "doc_id long, text string")
    got = {(r["pair"], r["cnt"]) for r in bpe_pair_counts(df, top_n=100).collect()}
    from collections import Counter

    exp = Counter()
    for w, c in _py_vocab(TINY).items():
        for i in range(len(w) - 1):
            exp[w[i : i + 2]] += c
    assert got == set(exp.items())


def test_bpe_learn_matches_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TINY)], "doc_id long, text string")
    merges, vocab_df = bpe_learn(df, num_merges=6)
    exp_merges, exp_vocab = _py_bpe(TINY, 6)
    assert merges == exp_merges
    got_vocab = {r["w"]: list(r["syms"]) for r in vocab_df.collect()}
    assert got_vocab == exp_vocab


def test_bpe_learn_empty_corpus(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    merges, vocab_df = bpe_learn(df, num_merges=3)
    assert merges == [] and vocab_df.count() == 0


# --------------------------------------------------- cluster representatives


def test_cluster_representatives_one_rep_max_quality(spark, sf_dir):
    from incubator_flink_old_spark.operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    out = cluster_representatives(docs, band_size=4)
    assert out.count() == docs.count()
    per = (
        out.groupBy("cluster_id")
        .agg(
            F.sum(F.col("is_rep").cast("int")).alias("reps"),
            F.max("quality").alias("maxq"),
            F.max_by("quality", F.col("is_rep").cast("int")).alias("repq"),
        )
        .collect()
    )
    for r in per:
        assert r["reps"] == 1
        assert r["repq"] == r["maxq"]
    # quality column must agree with the engine's own scorer
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    for r in out.collect():
        assert q[r["doc_id"]] == r["quality"]


# ------------------------------------------------------- centroid outliers


def test_centroid_outliers_rows_and_flag(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = centroid_outliers(emb)
    rows = out.collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert r["is_outlier"] == (r["centroid_cos"] < 0.0)


def test_centroid_outliers_partition_invariant(spark, sf_dir):
    """DECIMAL-sum centroids: the keep decision is identical under any
    input partitioning (the dsum contract)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = {tuple(r) for r in centroid_outliers(emb).collect()}
    b = {tuple(r) for r in centroid_outliers(emb.repartition(7)).collect()}
    assert a == b


def test_bpe_learn_fixture_partition_invariant(spark, sf_dir):
    """Merge lists are identical under any input partitioning: pair
    counts sum integers (order-free) and the argmax tie-break is total."""
    docs = load_table(spark, sf_dir, "documents")
    m1, _ = bpe_learn(docs, num_merges=3)
    m2, _ = bpe_learn(docs.repartition(7), num_merges=3)
    assert m1 == m2 and len(m1) == 3


def test_cluster_representatives_accepts_precomputed_pairs(spark, sf_dir):
    """Production pipelines compute the expensive pair list once; the
    representative selection must accept it instead of re-deriving."""
    from incubator_flink_old_spark.operators.text import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, band_size=4)
    a = {tuple(r) for r in cluster_representatives(docs, band_size=4).collect()}
    b = {tuple(r) for r in cluster_representatives(docs, pairs=pairs).collect()}
    assert a == b
