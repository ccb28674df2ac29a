"""Round-6 ADVICE hardening laws: z-order quantize clamps BOTH sides
(below-bounds deltas must not sign-extend through interleave_bits) and
the integer-grid cosine's zero-norm sentinel (NaN would rank
differently across engines). Each pins the exact failure mode from
ADVICE r05 items 3-4."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_quantize_clamps_below_lo(spark):
    from incubator_flink_old_spark.operators.layout import (
        interleave_bits,
        quantize,
    )

    # values straddle the recorded bounds [100, 200] on both sides
    df = spark.createDataFrame(
        [(-50,), (50,), (100,), (150,), (200,), (999,)], "x long"
    )
    out = df.select(
        "x",
        quantize(F.col("x"), 100, 200, bits=8).alias("q"),
        interleave_bits([quantize(F.col("x"), 100, 200, bits=8)], bits=8).alias(
            "z"
        ),
    ).collect()
    by_x = {r.x: r for r in out}
    top = (1 << 8) - 1
    for r in out:
        assert 0 <= r.q <= top, (r.x, r.q)
        assert 0 <= r.z, (r.x, r.z)  # no sign-extension scrambling
    # below-bounds degrades to the LOW boundary cell, above to the high
    assert by_x[-50].q == by_x[100].q == 0
    assert by_x[999].q == top
    # monotone within bounds
    assert by_x[100].q <= by_x[150].q <= by_x[200].q


def test_cosine_safe_zero_norm_sentinel(spark):
    from incubator_flink_old_spark.operators.similarity import cosine_safe

    df = spark.createDataFrame(
        [
            (1, [0.0, 0.0], [1.0, 0.0]),  # zero-norm left
            (2, [1.0, 0.0], [0.0, 0.0]),  # zero-norm right
            (3, [1.0, 0.0], [1.0, 0.0]),  # plain
            (4, [0.0, 0.0], [0.0, 0.0]),  # both zero
        ],
        "id long, a array<double>, b array<double>",
    )
    rows = {
        r.id: r.c
        for r in df.select("id", cosine_safe("a", "b").alias("c")).collect()
    }
    assert rows[1] == -2.0 and rows[2] == -2.0 and rows[4] == -2.0
    assert rows[3] == pytest.approx(1.0)
    # sentinel ranks strictly below any true cosine (>= -1)
    assert all(v >= -2.0 for v in rows.values())


def test_sql_cos_guard_matches_spark_sentinel():
    """The DuckDB oracle expression must produce the same -2.0 sentinel
    on zero-norm grid vectors as cosine_safe, so ROW_NUMBER ranking
    replays identically."""
    duckdb = pytest.importorskip("duckdb")
    from incubator_flink_old_spark.queries.llm_ops11 import _sql_cos

    con = duckdb.connect()
    expr = _sql_cos("a", "b")  # transform=True (grid path)
    got = con.execute(
        f"""
        SELECT id, {expr} AS c FROM (VALUES
            (1, [0,0]::BIGINT[], [1,0]::BIGINT[]),
            (2, [1,0]::BIGINT[], [0,0]::BIGINT[]),
            (3, [1,0]::BIGINT[], [1,0]::BIGINT[]),
            (4, [0,0]::BIGINT[], [0,0]::BIGINT[])
        ) AS t(id, a, b) ORDER BY id
        """
    ).fetchall()
    vals = dict(got)
    assert vals[1] == -2.0 and vals[2] == -2.0 and vals[4] == -2.0
    assert vals[3] == pytest.approx(1.0)
