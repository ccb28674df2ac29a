"""Tests for training-data pipeline operators beyond the SQL oracle gate:
multimodal plumbing (stubbed decode), similarity recall behavior, minhash
self-consistency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_flink_old_spark.operators.multimodal import (
    attach_media,
    decode_media,
    extract_features,
    sample_frames,
)
from incubator_flink_old_spark.operators.similarity import (
    brute_force_topk,
    lsh_near_pairs,
)
from incubator_flink_old_spark.operators.text import minhash_lsh_pairs
from incubator_flink_old_spark.sources import from_elements, load_table


def _media(spark):
    docs = from_elements(
        spark,
        [(1, "hello world"), (2, "hello world"), (3, "something else")],
        "doc_id long, text string",
    )
    return attach_media(docs, F.encode("text", "UTF-8"), "image", "image/fake", "doc_id")


def test_decode_without_codec_raises():
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "image", fake=False)


def test_extract_features_shape_and_determinism(spark):
    feats = extract_features(_media(spark), fake=True)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert set(rows) == {1, 2, 3}
    assert all(len(r["features"]) == 16 for r in rows.values())
    assert all(0.0 <= v < 1.0 for r in rows.values() for v in r["features"])
    # identical payloads → identical features; different → different
    assert rows[1]["features"] == rows[2]["features"]
    assert rows[1]["features"] != rows[3]["features"]
    assert rows[1]["n_bytes"] == len(b"hello world")
    # determinism across independent runs (different partitionings)
    again = {
        r["media_id"]: r["features"]
        for r in extract_features(_media(spark).repartition(3), fake=True).collect()
    }
    assert again == {k: r["features"] for k, r in rows.items()}


def test_sample_frames_explodes(spark):
    frames = sample_frames(_media(spark), every_ms=1000, fake=True)
    rows = frames.collect()
    assert len(rows) == 9  # 3 docs × 3 frames of the 3000ms default
    per_doc = [r for r in rows if r["media_id"] == 1]
    assert [r["frame_ms"] for r in sorted(per_doc, key=lambda r: r["frame_idx"])] == [
        0,
        1000,
        2000,
    ]
    # frame features differ per frame index
    assert per_doc[0]["features"] != per_doc[1]["features"]


def test_brute_force_topk_self_is_nearest(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    out = brute_force_topk(queries, emb, k=1).collect()
    # cosine(v, v) = 1 → each query's top-1 is itself
    assert {r["q_id"]: r["vec_id"] for r in out} == {0: 0, 1: 1, 2: 2}
    assert all(abs(r["cos"] - 1.0) < 1e-12 for r in out)


def test_lsh_pairs_subset_of_brute_force(spark, sf_dir):
    """LSH is approximate: it may miss pairs, never invent them."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 120)
    lsh = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in lsh_near_pairs(emb, threshold=0.2, num_bits=4).collect()
    }
    assert lsh, "expected some near pairs at threshold 0.2"
    # brute-force check each reported pair really crosses the threshold
    from incubator_flink_old_spark.operators.similarity import as_double_array, cosine

    a = emb.select(F.col("vec_id").alias("ia"), as_double_array("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), as_double_array("embedding").alias("vb"))
    full = (
        a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= 0.2)
    )
    brute = {(r["ia"], r["ib"]): r["cos"] for r in full.collect()}
    assert set(lsh).issubset(set(brute))
    for k, v in lsh.items():
        assert abs(v - brute[k]) < 1e-9


def test_minhash_identical_docs_always_pair(spark):
    docs = from_elements(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "epsilon delta gamma beta alpha"),  # same token set
            (3, "one two three four five"),
        ],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.9).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in pairs] == [(1, 2, 1.0)]


def test_ivf_topk_recall(spark, sf_dir):
    """IVF must return each query itself as top-1 (it lives in the probed
    cell by construction) and achieve decent recall vs brute force."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    from incubator_flink_old_spark.operators.similarity import ivf_topk

    ivf = ivf_topk(queries, emb, k=5, n_cells=8, n_probe=4, kmeans_iters=3)
    rows = ivf.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append((r["cos"], r["vec_id"]))
    assert set(by_q) == set(range(10))
    for q, hits in by_q.items():
        top = max(hits)
        assert top[1] == q and abs(top[0] - 1.0) < 1e-12  # self is top-1

    brute = brute_force_topk(queries, emb, k=5)
    brute_sets = {}
    for r in brute.collect():
        brute_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    overlap = sum(
        len(brute_sets[q] & {v for _, v in by_q[q]}) for q in brute_sets
    ) / sum(len(s) for s in brute_sets.values())
    assert overlap >= 0.5, f"IVF recall@5 too low: {overlap}"


def test_resize_media_updates_meta_and_payload(spark):
    from incubator_flink_old_spark.operators.multimodal import resize_media

    out = resize_media(_media(spark), 64, 48, fake=True)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert r["meta"]["width"] == 64 and r["meta"]["height"] == 48
        assert r["meta"]["modality"] == "image"
        assert isinstance(r["payload"], (bytes, bytearray)) and len(r["payload"]) == 16
    # deterministic and dimension-dependent
    out2 = {r["media_id"]: r["payload"] for r in resize_media(_media(spark), 64, 48).collect()}
    assert out2 == {k: r["payload"] for k, r in rows.items()}
    out3 = {r["media_id"]: r["payload"] for r in resize_media(_media(spark), 32, 32).collect()}
    assert out3 != out2


def test_simhash_pairs_banding_equals_naive(spark, sf_dir):
    """Bit-band candidate generation must be EXACT (pigeonhole): banded
    join + verify == naive all-pairs hamming filter, for several radii."""
    from incubator_flink_old_spark.operators.text import simhash16, simhash_pairs

    docs = load_table(spark, sf_dir, "documents").limit(200)
    sigs = {r["doc_id"]: r["simhash"] for r in simhash16(docs).collect()}
    ids = sorted(sigs)
    for k in (0, 1, 3):
        naive = {
            (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if bin(sigs[a] ^ sigs[b]).count("1") <= k
        }
        banded = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_pairs(docs, max_hamming=k).collect()
        }
        assert banded == naive, f"max_hamming={k}: banded != naive"


def test_simhash_pairs_rejects_bad_radius(spark):
    from incubator_flink_old_spark.operators.text import simhash_pairs

    docs = from_elements(spark, [(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        simhash_pairs(docs, max_hamming=16)


def test_salted_join_rejects_right_and_full(spark):
    """Right/full outer would duplicate unmatched right rows ×salt — the
    operator must refuse (operators/joins.salted_join contract)."""
    from incubator_flink_old_spark.operators.joins import salted_join

    left = from_elements(spark, [(1, "x")], "k long, v string")
    right = from_elements(spark, [(1, "y")], "rk long, w string")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError):
            salted_join(left, right, "k", "rk", how=how)


def _make_ppm(w, h):
    """Gradient P6 image: pixel (x, y) = (x*16 % 256, y*16 % 256, 7)."""
    import numpy as np

    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = (np.arange(w)[None, :] * 16) % 256
    img[:, :, 1] = (np.arange(h)[:, None] * 16) % 256
    img[:, :, 2] = 7
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes(), img


def test_ppm_decodes_for_real():
    """P6 payloads produce pixel-derived (not hash-derived) features."""
    import numpy as np

    from incubator_flink_old_spark.operators.multimodal import decode_media

    payload, img = _make_ppm(8, 4)
    feats = decode_media(payload, "image", fake=False)  # no codec needed
    assert feats[0] == 8.0 and feats[1] == 4.0  # width, height
    assert feats[2] == float(img[:, :, 0].mean())
    assert feats[4] == 7.0  # constant blue channel mean
    # malformed P6 still raises without fake
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG...", "image", fake=False)


def test_ppm_resize_real_pixels(spark):
    """resize_media downsamples real PPM pixels (nearest neighbor) and
    rewrites the metadata dims."""
    import numpy as np

    from incubator_flink_old_spark.operators.multimodal import (
        _parse_ppm,
        attach_media,
        resize_media,
    )

    payload, img = _make_ppm(8, 8)
    df = spark.createDataFrame([(1, bytearray(payload))], "media_id long, p binary")
    media = attach_media(df, F.col("p"), "image", "image/x-portable-pixmap", "media_id")
    out = resize_media(media, width=4, height=4, fake=False).collect()[0]
    assert out["meta"]["width"] == 4 and out["meta"]["height"] == 4
    small = _parse_ppm(bytes(out["payload"]))
    assert small.shape == (4, 4, 3)
    ys = (np.arange(4) * 8) // 4
    xs = (np.arange(4) * 8) // 4
    assert (small == img[ys][:, xs]).all()


def test_ppm_feature_extraction_through_spark(spark):
    """extract_features with fake=False works end-to-end when payloads
    are PPM — the real-codec path through mapInPandas/Arrow."""
    from incubator_flink_old_spark.operators.multimodal import (
        attach_media,
        extract_features,
    )

    rows = []
    for i, (w, h) in enumerate([(4, 4), (6, 2), (3, 5)]):
        payload, _ = _make_ppm(w, h)
        rows.append((i, bytearray(payload)))
    df = spark.createDataFrame(rows, "media_id long, p binary")
    media = attach_media(df, F.col("p"), "image", "image/x-portable-pixmap", "media_id")
    feats = {r["media_id"]: r["features"] for r in extract_features(media, fake=False).collect()}
    assert feats[0][:2] == [4.0, 4.0]
    assert feats[1][:2] == [6.0, 2.0]
    assert feats[2][:2] == [3.0, 5.0]


def test_dedup_clusters_local_and_distributed_agree(spark, sf_dir):
    """The adaptive residual solver (local union-find below the threshold,
    delta-iteration CC above it) must produce identical clusters."""
    from incubator_flink_old_spark.operators.text import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    local = dedup_clusters(docs, band_size=4)
    dist = dedup_clusters(docs, band_size=4, residual_local_max=0)
    a = {(r["doc_id"], r["cluster_id"], r["keep"]) for r in local.collect()}
    b = {(r["doc_id"], r["cluster_id"], r["keep"]) for r in dist.collect()}
    assert a == b and len(a) > 0
    # at least one non-singleton cluster exists in the fixture corpus
    assert any(not r[2] for r in a)


def test_containment_exact_equals_naive(spark):
    """Prefix-filter candidate generation must be EXACT: rarity-ordered
    prefix join + verify == naive all-ordered-pairs containment, on a
    Zipfian synthetic corpus where the prefix actually prunes (rare
    tokens discriminate) and across thresholds."""
    from incubator_flink_old_spark.operators.text import containment_pairs_exact
    from incubator_flink_old_spark.sources import from_elements

    # Zipfian-ish vocab: token j appears in ~n/(j+1) docs; doc i holds a
    # mix of common and rare tokens, plus exact excerpt pairs.
    rows = []
    for i in range(60):
        toks = [f"w{j}" for j in range(1, 12) if i % j == 0] + [f"rare{i % 13}"]
        rows.append((i, " ".join(toks)))
    # explicit excerpt: doc 100x is a strict subset of doc i's tokens
    for i in range(0, 60, 7):
        toks = [f"w{j}" for j in range(1, 12) if i % j == 0][:3]
        if toks:
            rows.append((100 + i, " ".join(toks)))
    docs = from_elements(spark, rows, "doc_id long, text string")

    def naive(th):
        toksets = {
            r["doc_id"]: set(r["text"].lower().split()) for r in docs.collect()
        }
        out = set()
        for a, ta in toksets.items():
            for b, tb in toksets.items():
                if a != b and ta and len(ta & tb) / len(ta) >= th:
                    out.add((a, b, round(len(ta & tb) / len(ta), 6)))
        return out

    for th in (0.7, 0.9, 1.0):
        got = {
            (r["contained"], r["container"], r["containment"])
            for r in containment_pairs_exact(docs, threshold=th).collect()
        }
        assert got == naive(th), f"threshold={th}"


def test_containment_exact_empty_docs_produce_no_rows(spark):
    from incubator_flink_old_spark.operators.text import containment_pairs_exact
    from incubator_flink_old_spark.sources import from_elements

    docs = from_elements(
        spark,
        [(1, "a b c"), (2, None), (3, ""), (4, "a b c d")],
        "doc_id long, text string",
    )
    got = {
        (r["contained"], r["container"])
        for r in containment_pairs_exact(docs, threshold=0.7).collect()
    }
    assert got == {(1, 4), (4, 1)}
