"""Unit tests for wave-3 curation operators: repetition gates,
decontamination, domain caps, embedding quantization — behavior checks
beyond the SQL oracle gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from incubator_flink_old_spark.operators.similarity import quantize_embeddings
from incubator_flink_old_spark.operators.text import (
    decontaminate,
    domain_cap,
    ngrams,
    repetition_metrics,
)
from incubator_flink_old_spark.sources import from_elements


def test_repetition_metrics_closed_form(spark):
    docs = from_elements(
        spark,
        [
            (1, "a b a b a b a b"),          # one dominant 2-gram
            (2, "u v w x y z q r s t"),      # all grams unique
            (3, "hi"),                       # below the 2-gram minimum
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    # doc 1: 8 tokens, "a b" occurs 4 times of 7 2-grams -> 2*4/8 = 1.0;
    # 5-grams: "a b a b a" x2, "b a b a b" x2 -> all 4 occurrences dup'd
    assert got[1]["top_2gram_frac"] == 1.0
    assert got[1]["dup_5gram_frac"] == 1.0
    assert not got[1]["keep_repetition"]
    # doc 2: every gram unique -> max count 1 -> 2/10, no dup 5-grams
    assert got[2]["top_2gram_frac"] == 0.2
    assert got[2]["dup_5gram_frac"] == 0.0
    assert got[2]["keep_repetition"]
    # doc 3: no grams at all -> zeros, kept
    assert got[3]["top_2gram_frac"] == 0.0 and got[3]["keep_repetition"]


def test_ngrams_short_doc_is_empty_not_descending(spark):
    """sequence(1, stop) descends for stop < 1 — the guard must yield []
    instead of phantom grams."""
    df = from_elements(spark, [(1, "only three tokens")], "doc_id long, text string")
    row = df.select(ngrams("text", 5).alias("g")).collect()[0]
    assert row["g"] == []


def test_decontaminate_flags_exact_overlap(spark):
    corpus = from_elements(
        spark,
        [
            (1, "one two three four five six seven eight nine ten"),
            (2, "totally different words with no overlap at all here now"),
        ],
        "doc_id long, text string",
    )
    bench = from_elements(
        spark,
        [(99, "one two three four five six seven eight extra tail")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=8).collect()}
    assert got[1]["contaminated"] and got[1]["n_hits"] == 1
    assert not got[2]["contaminated"] and got[2]["n_hits"] == 0


def test_domain_cap_keeps_first_k_per_source(spark):
    rows = [(i, f"s{i % 2}") for i in range(10)]
    df = from_elements(spark, rows, "doc_id long, source string")
    kept = domain_cap(df, cap=3)
    got = sorted((r["source"], r["doc_id"]) for r in kept.collect())
    assert got == [("s0", 0), ("s0", 2), ("s0", 4), ("s1", 1), ("s1", 3), ("s1", 5)]


def test_quantize_embeddings_roundtrip_error(spark):
    df = from_elements(
        spark,
        [(1, [3.0, 4.0]), (2, [-1.0, 0.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert abs(got[1]["l2_norm"] - 5.0) < 1e-9
    # unit vec (0.6, 0.8): max|x| = 0.8 -> q8 = (95, 127)
    assert got[1]["q8"] == [95, 127]
    # dequantized values approximate the unit vector within 1/254 * max
    for vid, unit in ((1, [0.6, 0.8]), (2, [-1 / math.sqrt(5), 0.0, 2 / math.sqrt(5)])):
        r = got[vid]
        for q, x in zip(r["q8"], unit):
            # scale ships rounded to 9dp, so allow that quantum on top
            assert abs(q * r["scale"] - x) <= r["scale"] / 2 + 1e-6


def test_semantic_dedup_keeps_lowest_key_representative(spark):
    from incubator_flink_old_spark.operators.similarity import semantic_dedup

    # vecs 1/2 identical direction (cos=1), 3 orthogonal; 2 cells
    df = from_elements(
        spark,
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [2.0, 0.0, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in semantic_dedup(df, n_cells=2, threshold=0.9).collect()}
    assert out[1]["keep"] is True          # lowest key in its dup group
    assert out[2]["keep"] is False         # cos(1,2) = 1.0 >= 0.9, same cell
    assert out[3]["keep"] is True          # orthogonal to everything
    assert out[1]["cell"] == out[2]["cell"]


def test_curate_pipeline_composition(spark, sf_dir):
    """curate() output respects every gate it claims to compose."""
    from incubator_flink_old_spark.operators.text import curate
    from incubator_flink_old_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = curate(docs, domain_cap_n=5).collect()
    assert len(out) > 0
    ids = {r["doc_id"] for r in out}
    assert all(r["lang"] in ("en", "de", "fr") for r in out)
    assert all(r["doc_id"] % 97 != 0 for r in out)
    assert all(r["quality"] >= 0.4 for r in out)
    # per-domain cap holds
    from collections import Counter

    per_src = Counter(r["source"] for r in out)
    assert max(per_src.values()) <= 5
    # kept docs are their own exact-dedup canonical
    from incubator_flink_old_spark.operators.text import fingerprint
    from pyspark.sql import functions as F

    fp = fingerprint(docs)
    canon = {
        r["__canon"]
        for r in fp.groupBy("fp").agg(F.min("doc_id").alias("__canon")).collect()
    }
    assert ids <= canon


def test_curate_fluent_api(spark, sf_dir):
    from incubator_flink_old_spark.api import ExecutionEnvironment

    env = ExecutionEnvironment(spark)
    ds = env.read_parquet(f"{sf_dir}/documents.parquet")
    assert ds.curate(domain_cap_n=3).count() > 0
