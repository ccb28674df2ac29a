"""Drift-triggered retrain demo (VERDICT r07 item 6): the maintenance
family EMITS drift audits — q_ivf_incremental's per-cell
(n_base, n_delta, frac_delta), q_sq8_incremental's per-dim clamp counts
— but round 7 shipped nothing that CONSUMES them. This tool closes the
operational loop: absorb a deliberately-SKEWED delta with the frozen
index, read the same audits the queries emit, trip the documented
thresholds, retrain, and print ANN recall on the drifted region before
vs after — the number that justifies when the flat-cost absorb path
must hand over to the corpus-cost retrain path.

Scenario: base = fixture embeddings; delta = a 20%-sized batch SHIFTED
by a constant offset (a new data source whose distribution walked away
from the training corpus — the classic drift case). Queries are drawn
from the DELTA (the region users will actually search next), ground
truth is exact full-precision top-k over the union.

Pipelines compared (both the SHIPPED operators):
- absorb: frozen base centers (grid_assign delta) + frozen base SQ8
  bounds (clamped delta encode) → IVF+SQ8+refine retrieval.
- retrain: Lloyd on the union + union bounds → same retrieval.

Thresholds (the demo's policy, printed alongside the audit values):
retrain when clamp_frac > 0.02 (2% of delta (dim, value) encodings hit
a frozen boundary) OR max-cell frac_delta > 3x the corpus-wide delta
fraction (the delta is piling into one cell — the frozen partition no
longer separates it).

Usage: python tools/drift_retrain_probe.py [SHIFT] (default 0.35 ~ the
fixture's full value range — a hard drift). Quiet box if quoted.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 5
N_QUERIES = 20
CLAMP_THRESHOLD = 0.02
CELL_SKEW_THRESHOLD = 3.0


def _recall(spark, union_eg, cells, centers, codes, bounds, queries):
    """recall@K of the shipped IVF(+probe)+SQ8+refine chain over the
    given index artifacts, measured on `queries` (q_id, k) against the
    exact full-precision top-K over the union."""
    from incubator_flink_old_spark.operators.similarity import grid_sqdist
    from incubator_flink_old_spark.queries.llm_ops11 import (
        _N_PROBE,
        _grid_probes,
    )
    from incubator_flink_old_spark.queries.llm_ops26 import _REFINE_C

    qk = queries.select(
        F.col("q_id"),
        F.transform("k", lambda x: x.cast("double")).alias("qv"),
    )
    # probe cells with the raw query vector (same machinery as the
    # registered rows: cosine over the grid vector vs centers)
    probes = _grid_probes(
        queries.select("q_id", F.col("emb").alias("embedding")),
        centers,
        n_probe=_N_PROBE,
    )
    cand = probes.join(cells, on="cell").select("q_id", "vec_id")
    qcodes = _encode_query_codes(qk, bounds)
    code_scored = (
        cand.join(codes, on="vec_id")
        .join(F.broadcast(qcodes), on="q_id")
        .select(
            "q_id",
            "vec_id",
            grid_sqdist(F.col("qcode"), F.col("code")).alias("cd"),
        )
    )
    wc = Window.partitionBy("q_id").orderBy("cd", "vec_id")
    shortlist = (
        code_scored.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= _REFINE_C)
        .select("q_id", "vec_id")
    )
    kd = union_eg.select(
        "vec_id", F.transform("k", lambda x: x.cast("double")).alias("kd")
    )
    w = Window.partitionBy("q_id").orderBy("d", "vec_id")
    it = (
        shortlist.join(kd, on="vec_id")
        .join(F.broadcast(qk), on="q_id")
        .select(
            "q_id", "vec_id", grid_sqdist(F.col("qv"), F.col("kd")).alias("d")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .select("q_id", "vec_id")
    )
    bt = (
        F.broadcast(qk)
        .crossJoin(kd.select("vec_id", F.col("kd").alias("cv")))
        .select(
            "q_id", "vec_id", grid_sqdist(F.col("qv"), F.col("cv")).alias("d")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .select(F.col("q_id").alias("bq"), F.col("vec_id").alias("bvec"))
    )
    hits = bt.join(
        it, (bt.bq == it.q_id) & (bt.bvec == it.vec_id)
    ).count()
    total = bt.count()
    return hits / total


def _encode_query_codes(qk, bounds):
    """Encode query grid vectors against the given bounds (clamped) —
    the symmetric code the refine family's stage-A scan compares."""
    from incubator_flink_old_spark.queries.llm_ops18 import _SQ_LEVELS

    dims = qk.select(
        "q_id", F.posexplode("qv").alias("p0", "v")
    ).select(
        "q_id",
        (F.col("p0") + 1).alias("p"),
        F.col("v").cast("long").alias("v"),  # integral grid doubles
    )
    c = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.expr(f"CAST((v - lo) * {_SQ_LEVELS} div (hi - lo) AS BIGINT)")
    )
    c = F.least(
        F.greatest(c, F.lit(0).cast("long")), F.lit(_SQ_LEVELS).cast("long")
    )
    qd = dims.join(F.broadcast(bounds), on="p").select(
        "q_id", "p", c.alias("c")
    )
    return qd.groupBy("q_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("p", "c"))),
            lambda s: s.getField("c").cast("double"),
        ).alias("qcode")
    )


def main() -> None:
    shift = float(sys.argv[1]) if len(sys.argv) > 1 else 0.35
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from incubator_flink_old_spark import get_spark
    from incubator_flink_old_spark.operators.similarity import (
        grid_assign,
        grid_ivf,
    )
    from incubator_flink_old_spark.queries.llm_ops11 import _ITERS, _N_CELLS
    from incubator_flink_old_spark.queries.llm_ops18 import (
        _grid_vec,
        _sq_bounds,
        _sq_codes,
    )
    from incubator_flink_old_spark.sources import load_table

    spark = get_spark("drift-retrain-probe")
    emb = load_table(spark, sf_dir, "embeddings")
    max_vec = emb.agg(F.max("vec_id")).first()[0] + 1

    base = emb.filter(F.col("vec_id") % 5 != 4).select("vec_id", "embedding")
    delta = emb.filter(F.col("vec_id") % 5 == 4).select(
        (F.col("vec_id") + max_vec).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(shift)).alias(
            "embedding"
        ),
    )
    union = base.unionByName(delta).localCheckpoint(eager=True)
    ueg = union.select("vec_id", _grid_vec().alias("k"))
    beg = base.select("vec_id", _grid_vec().alias("k"))
    deg = delta.select("vec_id", _grid_vec().alias("k"))

    # ---- frozen (absorb) index artifacts
    bcells, bcenters = grid_ivf(base, n_cells=_N_CELLS, iters=_ITERS)
    bcenters = bcenters.localCheckpoint(eager=True)
    d_assign = grid_assign(delta, bcenters)
    fcells = bcells.select("vec_id", "cell").unionByName(
        d_assign
    ).localCheckpoint(eager=True)
    fbounds = _sq_bounds(beg).localCheckpoint(eager=True)
    fcodes = _sq_codes(ueg, bounds=fbounds, clamp=True).localCheckpoint(
        eager=True
    )

    # ---- the drift audits the maintenance queries emit, consumed here
    n_delta, n_union = delta.count(), union.count()
    frac_corpus = n_delta / n_union
    cell_audit = (
        fcells.join(
            d_assign.select("vec_id").withColumn("is_delta", F.lit(1)),
            on="vec_id",
            how="left",
        )
        .groupBy("cell")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce("is_delta", F.lit(0))).alias("n_delta"),
        )
        .select(
            "cell", (F.col("n_delta") / F.col("n")).alias("frac_delta")
        )
    )
    max_frac_delta = cell_audit.agg(F.max("frac_delta")).first()[0]
    # clamp audit: fraction of delta (dim, value) encodings outside the
    # frozen bounds (exactly what q_sq8_incremental's n_clamp_lo/hi count)
    ddims = deg.select(F.posexplode("k").alias("p0", "v")).select(
        (F.col("p0") + 1).alias("p"), "v"
    )
    clamp = (
        ddims.join(F.broadcast(fbounds), on="p")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (
                    (F.col("v") < F.col("lo")) | (F.col("v") > F.col("hi"))
                ).cast("long")
            ).alias("out"),
        )
        .first()
    )
    clamp_frac = clamp["out"] / clamp["n"]
    cell_skew = max_frac_delta / frac_corpus if frac_corpus else 0.0
    trip = clamp_frac > CLAMP_THRESHOLD or cell_skew > CELL_SKEW_THRESHOLD
    print(
        f"shift={shift} delta_frac={frac_corpus:.3f} "
        f"clamp_frac={clamp_frac:.4f} (threshold {CLAMP_THRESHOLD}) "
        f"max_cell_frac_delta={max_frac_delta:.3f} "
        f"cell_skew={cell_skew:.1f}x (threshold {CELL_SKEW_THRESHOLD}x) "
        f"-> retrain_triggered={trip}",
        flush=True,
    )

    # ---- queries from the drifted region
    queries = (
        deg.orderBy("vec_id")
        .limit(N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), "k")
        .join(
            delta.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("emb")),
            on="q_id",
        )
        .localCheckpoint(eager=True)
    )

    r_frozen = _recall(spark, ueg, fcells, bcenters, fcodes, fbounds, queries)
    print(f"recall@{K} with FROZEN index (absorb path): {r_frozen:.3f}", flush=True)

    if trip or os.environ.get("DRIFT_FORCE_RETRAIN"):
        t0 = time.perf_counter()
        rcells, rcenters = grid_ivf(union, n_cells=_N_CELLS, iters=_ITERS)
        rcenters = rcenters.localCheckpoint(eager=True)
        rcells = rcells.select("vec_id", "cell").localCheckpoint(eager=True)
        rbounds = _sq_bounds(ueg).localCheckpoint(eager=True)
        rcodes = _sq_codes(ueg, bounds=rbounds).localCheckpoint(eager=True)
        t_retrain = time.perf_counter() - t0
        r_retrained = _recall(
            spark, ueg, rcells, rcenters, rcodes, rbounds, queries
        )
        print(
            f"recall@{K} after RETRAIN (union Lloyd + union bounds, "
            f"{t_retrain:.1f}s): {r_retrained:.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
