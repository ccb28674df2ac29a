"""Wave-6 operator tests: corpus diff, source overlap, token-id
encoding, data cards."""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_flink_old_spark.operators.text import (
    corpus_diff,
    source_overlap,
    tokenize_ids,
)
from incubator_flink_old_spark.sources import from_elements, load_table


def test_corpus_diff_statuses(spark):
    old = from_elements(
        spark,
        [(1, "a"), (2, "b"), (3, "c"), (4, None)],
        "doc_id long, text string",
    )
    new = from_elements(
        spark,
        [(2, "b"), (3, "c2"), (4, None), (5, "e")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "unchanged",  # NULL text fingerprints as empty on both sides
        5: "added",
    }


def test_source_overlap_matches_python(spark):
    rows = [
        (1, "one two three four five six seven eight nine", "A"),
        (2, "one two three four five six seven eight", "B"),
        (3, "totally different words that never overlap anything at all", "C"),
        (4, None, "C"),
    ]
    df = from_elements(spark, rows, "doc_id long, text string, source string")
    out = {
        (r["source_a"], r["source_b"]): (r["shared_grams"], r["overlap_coef"])
        for r in source_overlap(df, n=8).collect()
    }

    def grams(t):
        toks = t.lower().split()
        return {" ".join(toks[i : i + 8]) for i in range(len(toks) - 7)}

    ga, gb = grams(rows[0][1]), grams(rows[1][1])
    shared = len(ga & gb)
    assert out == {("A", "B"): (shared, round(shared / min(len(ga), len(gb)), 6))}


def test_tokenize_ids_exact(spark):
    df = from_elements(
        spark,
        [(1, "aa bb aa cc"), (2, "bb zz"), (3, None)],
        "doc_id long, text string",
    )
    # counts: aa=2, bb=2, cc=1, zz=1 → ids: aa=1, bb=2, cc=3, zz=4
    got = {r["doc_id"]: (r["ids"], r["n_ids"]) for r in
           tokenize_ids(df, vocab_size=4, max_len=64).collect()}
    assert got == {1: ("1,2,1,3", 4), 2: ("2,4", 2), 3: ("", 0)}
    # OOV → 0 when the vocab is smaller than the token set
    got2 = {r["doc_id"]: r["ids"] for r in
            tokenize_ids(df, vocab_size=2, max_len=3).collect()}
    assert got2 == {1: "1,2,1", 2: "2,0", 3: ""}


def test_data_card_consistency(spark, sf_dir):
    from incubator_flink_old_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    docs = load_table(spark, sf_dir, "documents")
    card = QUERIES["q_data_card"](spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in card) == docs.count()
    langs = (
        docs.groupBy("source", "lang").count().collect()
    )
    for r in card:
        assert 0.0 <= r["mean_quality"] <= 1.0
        per = [(x["count"], x["lang"]) for x in langs if x["source"] == r["source"]]
        best = min(per, key=lambda cv: (-cv[0], cv[1]))[1]
        assert r["top_lang"] == best


def test_template_dedup_groups(spark):
    from incubator_flink_old_spark.operators.text import template_dedup

    df = from_elements(
        spark,
        [
            (1, "Invoice 123 for order 456"),
            (2, "Invoice 999 for order 1"),
            (3, "Invoice 999   for  order 2"),  # whitespace collapses too
            (4, "totally different"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["template_id"], r["group_size"]) for r in
           template_dedup(df).collect()}
    assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3)}


def test_template_dedup_random_docs_yield_none(spark, sf_dir):
    """The documents fixture is random token text — template collapse
    must NOT invent groups there (q_template_dedup runs on events.props
    precisely because docs yield zero)."""
    from incubator_flink_old_spark.operators.text import template_dedup

    docs = load_table(spark, sf_dir, "documents")
    assert template_dedup(docs).count() == 0


def test_resolve_entities_transitive(spark):
    from incubator_flink_old_spark.operators.text import resolve_entities

    # chain of names one edit apart pairwise -> one entity by
    # transitivity; blocking keys on the shared FIRST TOKEN ("acme").
    df = from_elements(
        spark,
        [(10, "acme axxx"), (11, "acme axxy"), (12, "acme axyy"), (13, "zeta zzzz")],
        "k long, nm string",
    )
    out = {r["name"]: r["entity_id"] for r in
           resolve_entities(df, key="k", name="nm", max_dist=2).collect()}
    assert out == {
        "acme axxx": 10,
        "acme axxy": 10,
        "acme axyy": 10,
        "zeta zzzz": 13,
    }


def test_k_anonymity_flags(spark):
    from incubator_flink_old_spark.operators.text import k_anonymity

    df = from_elements(
        spark,
        [(1, "a", "x")] * 5 + [(2, "b", "y")] * 2,
        "id long, qa string, qb string",
    )
    got = {(r["qa"], r["qb"]): (r["class_size"], r["k_ok"]) for r in
           k_anonymity(df, quasi=("qa", "qb"), k=5).collect()}
    assert got == {("a", "x"): (5, True), ("b", "y"): (2, False)}


def test_negative_samples_contract(spark, sf_dir):
    from incubator_flink_old_spark.operators.text import negative_samples
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    out = negative_samples(docs, F.col("doc_id") % 17 == 0, k=4).collect()
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    per_q: dict = {}
    for r in out:
        assert r["neg_id"] in ids and r["neg_id"] != r["q_id"]
        assert 1 <= r["j"] <= 4
        per_q.setdefault(r["q_id"], set()).add(r["j"])
    # every query doc drew from distinct ring offsets
    for q, js in per_q.items():
        assert len(js) == len([r for r in out if r["q_id"] == q])
    # determinism: a second run returns the identical sample
    again = negative_samples(docs, F.col("doc_id") % 17 == 0, k=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
