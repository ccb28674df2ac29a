"""Property-based tests for the round-9-continuation operators: the
epoch-shuffle permutation, the stride-schedule proportionality and the
winnowing detection guarantee must hold for ANY corpus — random frames
probe the algebra, not just the fixtures. Example counts are low (each
example runs Spark jobs)."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st

from incubator_flink_old_spark.sources import from_elements

SETTINGS = dict(max_examples=5, deadline=None)

#: Random small document corpora: ids are distinct by construction.
docs = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=40),
    min_size=1,
    max_size=12,
)

words = st.lists(
    st.sampled_from(["tok%d" % i for i in range(12)]),
    min_size=0,
    max_size=20,
)


def _doc_frame(spark, texts):
    return from_elements(
        spark,
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


@given(texts=docs)
@settings(**SETTINGS)
def test_epoch_shuffle_permutation_any_corpus(spark, texts):
    """For ANY corpus: every (epoch, shard) position list is exactly
    1..size, and the full assignment is a 2×n permutation of the ids."""
    from incubator_flink_old_spark.operators.text import epoch_shuffle

    df = _doc_frame(spark, texts)
    rows = epoch_shuffle(df, epochs=2, n_shards=4).collect()
    assert len(rows) == 2 * len(texts)
    by_es = Counter()
    poss = {}
    for r in rows:
        poss.setdefault((r.epoch, r.shard), []).append(r.pos)
        by_es[r.epoch] += 1
    assert by_es[0] == len(texts) and by_es[1] == len(texts)
    for plist in poss.values():
        assert sorted(plist) == list(range(1, len(plist) + 1))


@given(ws=st.lists(st.sampled_from([1.0, 2.0, 4.0]), min_size=1, max_size=3))
@settings(**SETTINGS)
def test_mixture_schedule_proportionality_any_weights(spark, ws):
    """For ANY power-of-two weight assignment over the fixture sources:
    before the first source exhausts, every prefix's per-source count
    stays within one stride of the weight proportion."""
    from incubator_flink_old_spark.operators.text import mixture_schedule

    texts = ["w"] * 24
    df = from_elements(
        spark,
        [(i, t, f"s{i % len(ws)}") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    weights = {f"s{i}": w for i, w in enumerate(ws)}
    rows = sorted(
        mixture_schedule(df, weights).collect(), key=lambda r: r.sched_pos
    )
    per_source = Counter(r.source for r in rows)
    total_w = sum(weights.values())
    horizon = int(
        min(per_source[s] * total_w / w for s, w in weights.items())
    ) - len(weights)
    seen = Counter()
    for i, r in enumerate(rows[:horizon], start=1):
        seen[r.source] += 1
        for s, w in weights.items():
            assert abs(seen[s] - i * w / total_w) <= 1 + w


@given(
    pre_a=words, post_a=words, pre_b=words, post_b=words,
    run=st.lists(
        st.sampled_from(["sh%d" % i for i in range(8)]),
        min_size=6,
        max_size=10,
    ),
)
@settings(**SETTINGS)
def test_winnow_guarantee_any_embedding(spark, pre_a, post_a, pre_b, post_b, run):
    """The winnowing theorem for ANY surrounding text: two documents
    sharing a ≥ w+k-1 = 6-token run — embedded at arbitrary offsets in
    arbitrary other tokens — always share at least one selected
    fingerprint hash."""
    from incubator_flink_old_spark.operators.text import winnow_fingerprints

    doc_a = " ".join(pre_a + run + post_a)
    doc_b = " ".join(pre_b + run + post_b)
    df = _doc_frame(spark, [doc_a, doc_b])
    fps = winnow_fingerprints(df, k=3, w=4).collect()
    sets = {d: {r.fp for r in fps if r.doc_id == d} for d in (0, 1)}
    assert sets[0] & sets[1]
