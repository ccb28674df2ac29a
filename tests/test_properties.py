"""Property-based tests (hypothesis) — an upgrade over the reference's
example-based JUnit layer (SURVEY §5): algebraic laws of the engine's
operators checked on generated data. Example counts are kept low since
every example executes Spark jobs."""

from __future__ import annotations

import decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from incubator_flink_old_spark.operators import except_all, intersect, top_k, union_all
from incubator_flink_old_spark.operators.aggregates import exact_sum
from incubator_flink_old_spark.sources import from_elements

SETTINGS = dict(max_examples=12, deadline=None)

# doubles that survive a decimal(27,6) cast without overflow
sane_doubles = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)

# money-structured doubles (≤2 decimal digits, |v| < 4e7): the class of
# data the engine's decimal routing contracts over (see _util.dsum —
# full-mantissa doubles round differently between Spark and DuckDB, and
# above ~4.5e9 a 2dp value isn't representable to 6dp at all: ulp > 1e-6)
money_doubles = st.integers(min_value=-(4 * 10**9), max_value=4 * 10**9).map(
    lambda c: c / 100.0
)


@given(vals=st.lists(sane_doubles, min_size=1, max_size=40))
@settings(**SETTINGS)
def test_exact_sum_is_partition_order_independent(spark, vals):
    """exact_sum == python Decimal sum of the 6dp-quantized values,
    regardless of partitioning."""
    rows = [(i, v) for i, v in enumerate(vals)]
    df = from_elements(spark, rows, "i int, v double")
    got1 = df.agg(exact_sum("v").alias("s")).first()["s"]
    got2 = df.repartition(7).agg(exact_sum("v").alias("s")).first()["s"]
    # Spark's double→decimal cast rounds the SHORTEST DECIMAL REPR
    # (Java Double.toString == Python repr), NOT the exact binary value —
    # hypothesis found this on 536870912.5867745.
    want = float(
        sum(
            decimal.Decimal(repr(v)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
            for v in vals
        )
    )
    assert got1 == got2 == want


@given(vals=st.lists(money_doubles, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_dsum_matches_duckdb_oracle_on_money_doubles(spark, vals):
    """Cross-engine: the engine's dsum must equal the oracle-side decimal
    sum in DuckDB on decimal-structured (money-like) doubles — the data
    class the contract covers (full-mantissa doubles are excluded by
    design; see _util.dsum). This is the exact property the driver's
    hash compare relies on."""
    import duckdb

    from incubator_flink_old_spark.queries._util import dsum, sql_dsum

    df = from_elements(spark, [(v,) for v in vals], "v double")
    got = df.agg(dsum("v", "s")).first()["s"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = con.execute(f"SELECT {sql_dsum('v')} FROM t").fetchone()[0]
    con.close()
    assert got == want


@given(
    a=st.lists(st.integers(0, 20), max_size=25),
    b=st.lists(st.integers(0, 20), max_size=25),
)
@settings(**SETTINGS)
def test_set_op_algebra_matches_python(spark, a, b):
    da = from_elements(spark, [(x,) for x in a], "v int") if a else None
    db = from_elements(spark, [(x,) for x in b], "v int") if b else None
    if da is None or db is None:
        return
    got_union = sorted(r["v"] for r in union_all(da, db).collect())
    assert got_union == sorted(a + b)  # bag semantics
    got_inter = sorted(r["v"] for r in intersect(da, db).collect())
    assert got_inter == sorted(set(a) & set(b))
    got_except = sorted(r["v"] for r in except_all(da, db, keep_duplicates=False).collect())
    assert got_except == sorted(set(a) - set(b))


@given(
    vals=st.lists(
        st.tuples(st.integers(0, 1000), sane_doubles), min_size=1, max_size=30
    ),
    k=st.integers(1, 8),
)
@settings(**SETTINGS)
def test_top_k_matches_python_sort(spark, vals, k):
    rows = [(i, key, v) for i, (key, v) in enumerate(vals)]
    df = from_elements(spark, rows, "i int, key int, v double")
    got = [
        (r["key"], r["i"])
        for r in top_k(df, [F.col("v").desc(), F.col("i")], k).collect()
    ]
    want = [
        (key, i) for v, i, key in sorted(((v, i, key) for i, (key, v) in enumerate(vals)), key=lambda t: (-t[0], t[1]))
    ][:k]
    assert got == want


@given(
    n_tokens=st.integers(min_value=1, max_value=120),
    chunk=st.integers(min_value=2, max_value=40),
    overlap=st.integers(min_value=0, max_value=20),
)
@settings(**SETTINGS)
def test_chunking_covers_every_token_exactly(spark, n_tokens, chunk, overlap):
    """Chunk windows must cover every token position; consecutive chunks
    overlap by exactly `overlap` (except a possibly-shorter tail); and
    re-joining stride-prefixes reconstructs the document."""
    from incubator_flink_old_spark.operators.text import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    words = [f"w{i}" for i in range(n_tokens)]
    df = from_elements(
        spark, [(1, " ".join(words))], "doc_id long, text string"
    )
    rows = sorted(
        (r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    )
    stride = chunk - overlap
    covered = set()
    for idx, text, n in rows:
        toks = text.split(" ")
        assert len(toks) == n <= chunk
        start = idx * stride
        assert toks == words[start : start + n]
        covered.update(range(start, start + n))
    assert covered == set(range(n_tokens))


@given(frac=st.floats(min_value=0.0, max_value=1.0))
@settings(**SETTINGS)
def test_stratified_sample_is_deterministic_subset(spark, frac):
    """Same fraction → identical sample on re-run; and a smaller fraction
    samples a SUBSET of a larger one (nested hash thresholds)."""
    from incubator_flink_old_spark.operators.text import sample_stratified

    df = from_elements(
        spark,
        [(i, "en" if i % 2 == 0 else "de") for i in range(200)],
        "doc_id long, lang string",
    )
    take = lambda f: {
        r["doc_id"]
        for r in sample_stratified(
            df, "lang", {"en": f, "de": f / 2}, key="doc_id"
        ).collect()
    }
    s1, s2 = take(frac), take(frac)
    assert s1 == s2
    smaller = take(frac / 2)
    assert smaller.issubset(s1)


# words drawn from a tiny alphabet so generated docs actually repeat
_words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
_docs = st.lists(
    st.lists(_words, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


@given(texts=_docs)
@settings(**SETTINGS)
def test_repetition_metrics_match_python_reference(spark, texts):
    """top-2-gram coverage and dup-5-gram fraction equal a direct python
    computation on any generated corpus (incl. short/empty docs)."""
    from collections import Counter

    from incubator_flink_old_spark.operators.text import repetition_metrics

    rows = [(i, t) for i, t in enumerate(texts)]
    df = from_elements(spark, rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    for i, t in rows:
        toks = [w for w in t.lower().split() if w]
        g2 = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        g5 = [" ".join(toks[j : j + 5]) for j in range(len(toks) - 4)]
        top2 = 2 * max(Counter(g2).values()) / len(toks) if g2 else 0.0
        c5 = Counter(g5)
        dup5 = sum(c for c in c5.values() if c > 1) / len(g5) if g5 else 0.0
        assert got[i]["n_tokens"] == len(toks)
        assert abs(got[i]["top_2gram_frac"] - round(top2, 6)) < 1e-9
        assert abs(got[i]["dup_5gram_frac"] - round(dup5, 6)) < 1e-9


@given(texts=_docs)
@settings(**SETTINGS)
def test_decontaminate_equals_python_set_overlap(spark, texts):
    """n_hits equals the python set intersection of 3-gram sets against
    the benchmark subset (every other doc)."""
    from incubator_flink_old_spark.operators.text import decontaminate

    rows = [(i, t) for i, t in enumerate(texts)]
    df = from_elements(spark, rows, "doc_id long, text string")
    bench_rows = [(i, t) for i, t in rows if i % 2 == 0]
    bench = from_elements(spark, bench_rows, "doc_id long, text string") if bench_rows else df.limit(0)
    got = {r["doc_id"]: r["n_hits"] for r in decontaminate(df, bench, n=3).collect()}

    def grams(t):
        toks = [w for w in t.lower().split() if w]
        return {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}

    bench_set = set().union(*(grams(t) for _, t in bench_rows)) if bench_rows else set()
    for i, t in rows:
        assert got[i] == len(grams(t) & bench_set)


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-8, max_value=8, allow_nan=False).filter(
                lambda x: abs(x) > 1e-3 or x == 0.0
            ),
            min_size=2,
            max_size=5,
        ).filter(lambda v: any(x != 0.0 for x in v)),
        min_size=1,
        max_size=5,
    )
)
@settings(**SETTINGS)
def test_quantize_dequantize_bound(spark, vecs):
    """For any nonzero vector: q8 ∈ [-127, 127], the max-|component| hits
    ±127 exactly, and dequantized values reconstruct the unit vector
    within half a quantization step (+ the 9dp scale rounding)."""
    import math

    from incubator_flink_old_spark.operators.similarity import quantize_embeddings

    # pad to a rectangular matrix (spark arrays may be ragged; fine)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = from_elements(spark, rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    for i, v in rows:
        nrm = math.sqrt(sum(x * x for x in v))
        unit = [x / nrm for x in v]
        r = got[i]
        assert max(abs(q) for q in r["q8"]) == 127
        for q, x in zip(r["q8"], unit):
            assert abs(q) <= 127
            assert abs(q * r["scale"] - x) <= r["scale"] / 2 + 1e-6


# --- wave 5-8 operator laws ------------------------------------------

name_words = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=4), min_size=1, max_size=3
).map(" ".join)


@given(names=st.lists(name_words, min_size=2, max_size=14, unique=True))
@settings(max_examples=8, deadline=None)
def test_fuzzy_pairs_equals_naive_blocked(spark, names):
    """±1-bucket probing loses nothing vs the naive first-token-blocked
    all-pairs join at the same threshold, on generated names."""
    import itertools

    from incubator_flink_old_spark.operators.text import fuzzy_pairs

    rows = [(i, nm) for i, nm in enumerate(names)]
    df = from_elements(spark, rows, "k long, nm string")
    got = {(r["name_a"], r["name_b"], r["dist"]) for r in
           fuzzy_pairs(df, key="k", name="nm", max_dist=4).collect()}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = set()
    for a, b in itertools.combinations(sorted(set(names)), 2):
        if a.split()[0] == b.split()[0] and lev(a, b) <= 4:
            want.add((a, b, lev(a, b)))
    assert got == want


@given(
    syms=st.lists(st.sampled_from(["a", "b", "ab", "c"]), min_size=0, max_size=10),
    pair=st.tuples(st.sampled_from(["a", "b", "ab"]), st.sampled_from(["a", "b", "c"])),
)
@settings(max_examples=10, deadline=None)
def test_bpe_merge_adjacent_matches_python(spark, syms, pair):
    """The JVM aggregate merge pass == the greedy left-to-right Python
    merge on arbitrary symbol sequences."""
    from incubator_flink_old_spark.operators.text import _merge_adjacent

    a, b = pair
    df = from_elements(spark, [(1,)], "i long").select(
        _merge_adjacent(F.array(*[F.lit(s) for s in syms]), a, b).alias("m")
    )
    got = list(df.first()["m"])
    want, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            want.append(a + b)
            i += 2
        else:
            want.append(syms[i])
            i += 1
    assert got == want


@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=8).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=8, deadline=None)
def test_tokenize_ids_matches_python(spark, texts):
    """Token-id encoding == the pure-Python encoder (same vocab ranking
    and OOV rule) on generated corpora."""
    from collections import Counter

    from incubator_flink_old_spark.operators.text import tokenize_ids

    rows = [(i, t) for i, t in enumerate(texts)]
    df = from_elements(spark, rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["ids"], r["n_ids"]) for r in
           tokenize_ids(df, vocab_size=3, max_len=4).collect()}
    counts = Counter(w for t in texts for w in t.lower().split())
    vocab = {w: i + 1 for i, (w, _) in enumerate(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3])}
    for i, t in rows:
        toks = t.lower().split()[:4]
        ids = ",".join(str(vocab.get(w, 0)) for w in toks)
        assert got[i] == (ids, len(toks))


@given(
    words=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f"]), min_size=1, max_size=60
    ),
    threshold=st.integers(min_value=1, max_value=12),
    parts=st.integers(min_value=1, max_value=6),
)
@settings(**SETTINGS)
def test_heavy_hitters_law(spark, words, threshold, parts):
    """heavy_hitters == {w: count(w) ≥ T} with EXACT counts, under any
    partitioning (the pigeonhole-prune law from operators/sketches)."""
    from collections import Counter

    from incubator_flink_old_spark.operators.sketches import heavy_hitters

    df = from_elements(spark, [(w,) for w in words], "w string").repartition(parts)
    got = {r["w"]: r["cnt"] for r in heavy_hitters(df, threshold).collect()}
    want = {w: c for w, c in Counter(words).items() if c >= threshold}
    assert got == want


@given(
    present=st.sets(st.integers(min_value=-(2**40), max_value=2**40), max_size=30),
    probes=st.sets(st.integers(min_value=-(2**40), max_value=2**40), max_size=30),
)
@settings(**SETTINGS)
def test_bloom_never_rejects_inserted_values(spark, present, probes):
    """Bloom law: no false negatives, ever — any inserted value probes
    positive; absent values may or may not (FP allowed by contract)."""
    from incubator_flink_old_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    if not present:
        return
    vals = from_elements(spark, [(v,) for v in present], "g long")
    bf = bloom_build(vals, "g", num_bits=1 << 10, num_hashes=3)
    both = from_elements(
        spark, [(v,) for v in present | probes], "g long"
    ).join(F.broadcast(bf))
    hits = {
        r["g"]
        for r in both.filter(
            bloom_might_contain(F.col("g"), F.col("__bf"), 1 << 10, 3)
        ).collect()
    }
    assert present <= hits


# --------------------------------------------------------------------------
# Layout primitives (wave 24): grid + Morton laws
# --------------------------------------------------------------------------
@given(
    lo=st.integers(min_value=-(10**12), max_value=10**12),
    span=st.integers(min_value=0, max_value=10**13),
    fracs=st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=2,
        max_size=12,
    ),
    bits=st.sampled_from([4, 8, 16]),
)
@settings(max_examples=8, deadline=None)
def test_quantize_laws(spark, lo, span, fracs, bits):
    """Monotone, on-grid, and — the stretch law — the top of the span
    always lands in the UPPER HALF of the grid (so no dimension's bits
    can be starved out of the curve by a narrow span; the degenerate
    1-D-sort failure mode caught at sf0.001)."""
    from incubator_flink_old_spark.operators.layout import quantize

    hi = lo + span
    xs = sorted({lo + int(f * span) for f in fracs} | {lo, hi})
    df = from_elements(spark, [(x,) for x in xs], "x long")
    rows = (
        df.select("x", quantize(F.col("x"), lo, hi, bits).alias("q"))
        .orderBy("x")
        .collect()
    )
    qs = [r.q for r in rows]
    assert qs == sorted(qs)
    assert all(0 <= q < (1 << bits) for q in qs)
    assert qs[0] == 0
    if span >= 1:
        assert qs[-1] >= (1 << bits) // 2 - 1, (
            f"stretch law violated: top of span maps to {qs[-1]}"
        )


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=2,
        max_size=16,
        unique=True,
    ),
)
@settings(max_examples=8, deadline=None)
def test_interleave_laws(spark, pairs):
    """Injective on the grid, and strictly monotone in each coordinate
    with the other fixed — the property per-dimension min/max pruning
    of a z-range file needs."""
    from incubator_flink_old_spark.operators.layout import interleave_bits

    df = from_elements(spark, pairs, "a long, b long")
    rows = df.select(
        "a", "b", interleave_bits([F.col("a"), F.col("b")], bits=8).alias("z")
    ).collect()
    zmap = {(r.a, r.b): r.z for r in rows}
    assert len(set(zmap.values())) == len(zmap)
    by_b: dict[int, list] = {}
    by_a: dict[int, list] = {}
    for (a, b), z in zmap.items():
        by_b.setdefault(b, []).append((a, z))
        by_a.setdefault(a, []).append((b, z))
    for grp in list(by_b.values()) + list(by_a.values()):
        grp.sort()
        zs = [z for _, z in grp]
        assert zs == sorted(zs)


@given(
    rows=st.dictionaries(
        st.integers(min_value=-1000, max_value=1000),
        st.tuples(
            st.integers(min_value=-(10**6), max_value=10**6),
            st.integers(min_value=-(10**6), max_value=10**6),
        ),
        min_size=1,
        max_size=25,
    ),
)
@settings(max_examples=6, deadline=None)
def test_global_prefix_agg_law(spark, rows):
    """Equals the sequential prefix over the sorted (tie-broken) order,
    for max and sum simultaneously, on any partitioning."""
    from incubator_flink_old_spark.operators.aggregates import (
        global_prefix_agg,
    )

    data = [(k, v, s) for k, (v, s) in rows.items()]
    df = from_elements(spark, data, "k long, v long, s long").repartition(5)
    got = {
        r.k: (r.m, r.t)
        for r in global_prefix_agg(
            df,
            [F.col("k")],
            {"m": (F.col("v"), "max"), "t": (F.col("s"), "sum")},
        ).collect()
    }
    vmax, ssum = None, 0
    for k, v, s in sorted(data):
        vmax = v if vmax is None else max(vmax, v)
        ssum += s
        assert got[k] == (vmax, ssum)
