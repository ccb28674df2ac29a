"""Robustness tests for the wave-20 operators (round 4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import QUERIES, load_all_queries
from incubator_flink_old_spark.sources import from_elements, load_table

load_all_queries()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_minhash_estimate_law(spark, sf_dir):
    """Estimates are multiples of 1/8; identical token sets (jaccard
    1.0) must show full signature agreement (est 1.0) — MinHash is
    exact on identical sets."""
    out = QUERIES["q_minhash_est_jaccard"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert abs(r["jac_est"] * 8 - round(r["jac_est"] * 8)) < 1e-12
        if r["jac_exact"] == 1.0:
            assert r["jac_est"] == 1.0


def test_knn_classify_deterministic_and_complete(spark, sf_dir):
    a = QUERIES["q_knn_classify"](spark, sf_dir)
    rows = _rows(a)
    assert len(rows) == 20  # one verdict per query vector
    assert rows == _rows(QUERIES["q_knn_classify"](spark, sf_dir))


def test_rolling_range_window_frame_membership(spark):
    """Events >3600 s older than the current row leave the frame; ties
    on the timestamp are all in-frame."""
    from pyspark.sql import Window

    ev = from_elements(
        spark,
        [
            (1, 0, 1.0),
            (2, 1800, 2.0),
            (3, 3600, 4.0),   # exactly 3600s after e1 → still in range
            (4, 7300, 8.0),   # everything else out of range
        ],
        "event_id long, sec long, value double",
    ).select(
        "event_id",
        F.lit(1).alias("user_id"),
        F.timestamp_seconds("sec").alias("ts"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    got = {
        r["event_id"]: (r["n"], r["s"])
        for r in ev.select(
            "event_id",
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum("value").over(w).alias("s"),
        ).collect()
    }
    assert got == {1: (1, 1.0), 2: (2, 3.0), 3: (3, 7.0), 4: (1, 8.0)}


def test_graph_2hop_path_graph(spark):
    """Path a−b−c: a's 2-hop set is {c} (b is direct, a is self)."""
    from pyspark.sql import functions as F  # noqa: F811

    edges = from_elements(spark, [(0, 1), (1, 2)], "src long, dst long")
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("src").alias("a"), F.col("dst").alias("b")),
                    F.struct(F.col("dst").alias("a"), F.col("src").alias("b")),
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )
    two = (
        sym.alias("x")
        .join(sym.alias("y"), F.col("x.b") == F.col("y.a"))
        .filter(F.col("y.b") != F.col("x.a"))
        .select(F.col("x.a").alias("id"), F.col("y.b").alias("h2"))
        .distinct()
    )
    direct = sym.select(F.col("a").alias("id"), F.col("b").alias("h2"))
    got = _rows(two.join(direct, on=["id", "h2"], how="left_anti"))
    assert got == [(0, 2), (2, 0)]


def test_time_to_event_excludes_preconversion_purchases(spark, sf_dir):
    out = QUERIES["q_time_to_event"](spark, sf_dir).collect()
    assert all(r["micros_to_convert"] >= 0 for r in out)


def test_ks_drift_identical_distributions_is_zero(spark):
    """KS of a distribution against itself is 0 at every grid point."""
    from pyspark.sql import Window

    d = from_elements(
        spark,
        [(n, s) for n in (10, 20, 30) for s in ("train", "test")],
        "n_chars long, split string",
    )
    tot = d.agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("nt"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("ns"),
    )
    g = d.groupBy("n_chars").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("cs"),
    )
    w = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = g.select(
        "n_chars",
        F.sum("ct").over(w).alias("cum_t"),
        F.sum("cs").over(w).alias("cum_s"),
    )
    diff = c.crossJoin(F.broadcast(tot)).select(
        F.abs(
            F.col("cum_t").cast("double") / F.col("nt")
            - F.col("cum_s").cast("double") / F.col("ns")
        ).alias("d")
    )
    assert diff.agg(F.max("d")).collect()[0][0] == 0.0


def test_rfm_quartiles_cover_all_purchasers(spark, sf_dir):
    out = QUERIES["q_rfm"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    n_purchasers = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    rows = out.collect()
    assert len(rows) == n_purchasers
    for col in ("r_quartile", "f_quartile", "m_quartile"):
        assert all(1 <= r[col] <= 4 for r in rows)


def test_stream_dedup_parity_reruns(spark, sf_dir):
    """Each invocation uses a fresh memory sink and agrees with batch."""
    ev = load_table(spark, sf_dir, "events")
    batch = _rows(
        ev.groupBy("user_id", "event_type").agg(
            F.min("event_id").alias("canonical_event"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    assert _rows(QUERIES["q_stream_dedup_parity"](spark, sf_dir)) == batch
    assert _rows(QUERIES["q_stream_dedup_parity"](spark, sf_dir)) == batch


def test_split_law_cross_engine(spark, duck, sf_dir):
    """The md5-Bernoulli split is defined ONCE (_util.split_col /
    split_case_sql); prove the Spark and DuckDB formulations assign the
    identical split to every document — the invariant the leakage and
    drift audits depend on."""
    from incubator_flink_old_spark.queries._util import split_case_sql, split_col

    sp = {
        r["doc_id"]: r["split"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", split_col("doc_id").alias("split"))
        .collect()
    }
    du = dict(
        duck.execute(
            f"SELECT doc_id, {split_case_sql()} AS split FROM documents"
        ).fetchall()
    )
    assert sp == du and len(sp) > 0


def test_pca_eigen_law_and_determinism(spark, sf_dir):
    """Power iteration converges to a vector satisfying G v ≈ λ v with
    λ = vᵀGv > 0 (dominant eigenpair of a PSD covariance), and the
    per-row projections are deterministic under repartitioning."""
    from incubator_flink_old_spark.operators.similarity import (
        embedding_covariance,
        pca_top_component,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cov = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(emb).collect()}
    d = 64
    import math

    v = [1.0 / math.sqrt(d)] * d
    for _ in range(20):
        w = [sum(cov[(i, j)] * v[j] for j in range(d)) for i in range(d)]
        nrm = math.sqrt(sum(x * x for x in w)) or 1.0
        v = [x / nrm for x in w]
    lam = sum(v[i] * sum(cov[(i, j)] * v[j] for j in range(d)) for i in range(d))
    assert lam > 0
    resid = math.sqrt(
        sum(
            (sum(cov[(i, j)] * v[j] for j in range(d)) - lam * v[i]) ** 2
            for i in range(d)
        )
    )
    assert resid < 0.05 * lam  # Gv ≈ λv within 5%
    a = _rows(pca_top_component(emb))
    b = _rows(pca_top_component(emb.repartition(7)))
    assert a == b and len(a) > 0


def test_embedding_covariance_is_symmetric_psd_diagonal(spark, sf_dir):
    from incubator_flink_old_spark.operators.similarity import (
        embedding_covariance,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cov = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(emb).collect()}
    assert len(cov) == 64 * 64
    for (i, j), v in cov.items():
        assert cov[(j, i)] == v  # exact symmetry (decimal-exact sums)
        if i == j:
            assert v >= 0  # variances
