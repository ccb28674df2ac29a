"""Wave-24 surfaces: the Z-order (Morton) layout operator and its probe
query. The oracle gate in test_queries_oracle.py value-checks
q_zorder_layout against DuckDB like every registered query; these tests
pin the LAYOUT-specific properties the hash can't see — grid monotonicity,
interleave bijectivity, per-file clustering tightness, and both rectangle
predicates reaching the parquet footer as PushedFilters."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_quantize_monotone_and_bounded(spark):
    """quantize() must be order-preserving (min/max pruning soundness)
    and land every value on the [0, 2^bits) grid, endpoints included."""
    from incubator_flink_old_spark.operators.layout import quantize

    lo, hi, bits = 100, 987_654, 8
    df = spark.range(lo, hi + 1, 37).select(
        F.col("id"), quantize(F.col("id"), lo, hi, bits).alias("q")
    )
    rows = df.orderBy("id").collect()
    qs = [r.q for r in rows]
    assert qs == sorted(qs), "quantize is not monotone"
    assert qs[0] == 0 and all(0 <= q < (1 << bits) for q in qs)
    # endpoint lands on the top cell-ish region, never past the grid
    top = (
        spark.range(hi, hi + 1)
        .select(quantize(F.col("id"), lo, hi, bits).alias("q"))
        .collect()[0]
        .q
    )
    assert 0 < top < (1 << bits)


def test_quantize_degenerate_span(spark):
    from incubator_flink_old_spark.operators.layout import quantize

    q = (
        spark.range(5, 6)
        .select(quantize(F.col("id"), 5, 5, 16).alias("q"))
        .collect()[0]
        .q
    )
    assert q == 0


def test_interleave_bits_bijective(spark):
    """Every (a, b) pair on a 4-bit grid must map to a distinct z-value,
    and each coordinate's bits must be recoverable from the expected
    positions (bit i of dim j at position i*k + j)."""
    from incubator_flink_old_spark.operators.layout import interleave_bits

    df = (
        spark.range(16)
        .withColumnRenamed("id", "a")
        .crossJoin(spark.range(16).withColumnRenamed("id", "b"))
        .select(
            "a",
            "b",
            interleave_bits([F.col("a"), F.col("b")], bits=4).alias("z"),
        )
    )
    rows = df.collect()
    assert len({r.z for r in rows}) == 256, "z collision on a 4-bit grid"
    for r in rows:
        a = sum(((r.z >> (2 * i)) & 1) << i for i in range(4))
        b = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(4))
        assert (a, b) == (r.a, r.b)


def test_interleave_width_guard(spark):
    from incubator_flink_old_spark.operators.layout import interleave_bits

    with pytest.raises(ValueError):
        interleave_bits([F.col("a")] * 4, bits=16)  # 64 bits > signed long


@pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")
def test_zorder_probe_pushes_both_range_predicates(spark):
    """The probe the registered query returns must reach the parquet
    scan with BOTH dimensions' range predicates as PushedFilters — a
    join-derived or expression-wrapped bound would read the whole
    layout and silently void the multi-dimensional pruning claim."""
    from incubator_flink_old_spark.queries.llm_ops12 import (
        _zorder_write_and_probe,
    )

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        probe, _ = _zorder_write_and_probe(spark, SF)
        plan = probe._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    scan_lines = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert scan_lines, plan[:2000]
    pushed = scan_lines[0].split("PushedFilters:")[1]
    for frag in (
        "GreaterThanOrEqual(user_id",
        "LessThanOrEqual(user_id",
        "GreaterThanOrEqual(t_us",
    ):
        assert frag in pushed, f"missing {frag} in {pushed}"


@pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")
def test_zorder_files_are_clustered_on_both_dims(spark):
    """Clustering tightness: any n-file split covers ~1/n of the space
    per file; what distinguishes the Morton layout from a 1-D sort is
    that each file's footprint is a BALANCED rectangle — small span on
    BOTH dims — where a 1-D sort is tight on the sorted dim and
    full-span (fraction ≈ 1.0) on the other. Row-group min/max pruning
    of a 2-D rectangle probe rides exactly on this property."""
    from incubator_flink_old_spark.queries.llm_ops12 import (
        _zorder_write_and_probe,
    )

    _, path = _zorder_write_and_probe(spark, SF)
    files = [f for f in glob.glob(path + "/*.parquet")]
    assert len(files) >= 4
    stored = spark.read.parquet(path)
    gu_min, gu_max, gt_min, gt_max = stored.agg(
        F.min("user_id"), F.max("user_id"), F.min("t_us"), F.max("t_us")
    ).collect()[0]
    gu = max(gu_max - gu_min, 1)
    gt = max(gt_max - gt_min, 1)
    per_file = (
        stored.withColumn("__f", F.input_file_name())
        .groupBy("__f")
        .agg(
            F.min("user_id").alias("ul"),
            F.max("user_id").alias("uh"),
            F.min("t_us").alias("tl"),
            F.max("t_us").alias("th"),
        )
        .collect()
    )
    u_fracs = [(r.uh - r.ul) / gu for r in per_file]
    t_fracs = [(r.th - r.tl) / gt for r in per_file]
    mean_u = sum(u_fracs) / len(u_fracs)
    mean_t = sum(t_fracs) / len(t_fracs)
    # a 1-D sort gives ~1.0 mean span on the unsorted dim; a Morton
    # split into >=8 z-ranges keeps BOTH means well below (dyadic
    # regions — occasional boundary-straddling files allowed for).
    assert mean_u < 0.6 and mean_t < 0.6, (
        f"files not 2-D clustered: mean span fractions "
        f"user={mean_u:.3f} time={mean_t:.3f}"
    )


def test_global_prefix_agg_matches_window(spark):
    """global_prefix_agg must equal the single-partition running
    aggregate for max (strict + inclusive) and sum, across partition
    boundaries and with a forced multi-partition range split."""
    from incubator_flink_old_spark.operators.aggregates import (
        global_prefix_agg,
    )
    from incubator_flink_old_spark.sources import local_rows

    rows = [(i, (i * 7919) % 101, (i % 13) - 6) for i in range(200)]
    df = local_rows(spark, rows, "k long, v long, s long")
    out = global_prefix_agg(
        df.repartition(7),
        [F.col("k")],
        {
            "run_max": (F.col("v"), "max"),
            "run_sum": (F.col("s"), "sum"),
        },
    ).collect()
    got = {r.k: (r.run_max, r.run_sum) for r in out}
    vmax, ssum = None, 0
    for k, v, s in sorted(rows):
        vmax = v if vmax is None else max(vmax, v)
        ssum += s
        assert got[k] == (vmax, ssum), f"at k={k}"


def test_global_prefix_agg_strict_first_row_null(spark):
    from incubator_flink_old_spark.operators.aggregates import (
        global_prefix_agg,
    )
    from incubator_flink_old_spark.sources import local_rows

    rows = [(i, i * 2) for i in range(50)]
    df = local_rows(spark, rows, "k long, v long")
    out = global_prefix_agg(
        df, [F.col("k")], {"m": (F.col("v"), "max")}, strict=True
    ).collect()
    got = {r.k: r.m for r in out}
    assert got[0] is None
    for k in range(1, 50):
        assert got[k] == (k - 1) * 2


@pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")
def test_skyline_and_ks_drift_have_no_unpartitioned_window(spark):
    """The r04 'same class' residue: no window over a corpus-growable
    frame without a partition key may survive in these plans."""
    from incubator_flink_old_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    for name in ("q_skyline", "q_ks_drift"):
        df = QUERIES[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Window" in line and "windowspecdefinition" in line:
                assert "__pid" in line, (
                    f"{name}: unpartitioned window survived:\n{line}"
                )


@pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")
def test_ivfpq_recall_bounds_and_coverage(spark):
    """Composition law: the IVF+PQ row reports one row per query vector,
    hits in [0, k], recall = hits/k exactly — and because the candidate
    set is a subset of the PQ query's (cell-pruned vs full corpus), the
    summed IVF+PQ hits can never exceed the summed PQ hits... UNLESS ADC
    ties reorder inside the pruned set, so we assert the per-query hit
    is bounded by k, not cross-query dominance."""
    from incubator_flink_old_spark.queries import QUERIES, load_all_queries
    from incubator_flink_old_spark.queries.llm_ops11 import _N_QUERIES, _TOPK

    load_all_queries()
    rows = QUERIES["q_ann_recall_ivfpq"](spark, SF).collect()
    assert len(rows) == min(
        _N_QUERIES,
        QUERIES["q_ann_recall_pq"](spark, SF).count(),
    )
    for r in rows:
        assert 0 <= r.hits <= _TOPK
        assert abs(r.recall - r.hits / _TOPK) < 1e-12
