"""Shared pytest fixtures: one SparkSession per test session, DuckDB
oracle harness mirroring the driver's compare (row count + schema-width +
order-insensitive value hash)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from incubator_flink_old_spark import get_spark
from incubator_flink_old_spark.sources import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark("engine-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for order-insensitive comparison across engines."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # bit-stable queries should match exactly; tolerate float32 noise
        return round(v, 9)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _assert_no_negative_zero(rows, side):
    """Structural tripwire (round-4 finding): IEEE −0.0 in a result cell
    hashes differently from +0.0 in the driver's canonicalizer (repr),
    and the engines disagree on which they produce — DuckDB's ROUND
    keeps the sign of a tiny negative, Spark's BigDecimal round yields
    +0.0. Queries must flush signed zero (`+ 0.0` on both sides)."""
    def has_negzero(v):
        if isinstance(v, float):
            return v == 0.0 and math.copysign(1, v) < 0
        if isinstance(v, tuple):  # _norm preserves arrays/structs as tuples
            return any(has_negzero(x) for x in v)
        return False

    for row in rows:
        for v in row:
            if has_negzero(v):
                raise AssertionError(
                    f"{side} result contains IEEE -0.0 — normalize with "
                    "`+ 0.0` on BOTH engine sides (driver hashes repr)"
                )


def assert_matches_oracle(spark_df, duck_con, sql, sort_cols=None):
    """Order-insensitive exact compare of a Spark DataFrame vs DuckDB SQL."""
    actual = [tuple(_norm(v) for v in row) for row in spark_df.collect()]
    expected = [tuple(_norm(v) for v in row) for row in duck_con.execute(sql).fetchall()]
    _assert_no_negative_zero(actual, "spark")
    _assert_no_negative_zero(expected, "duckdb")
    assert len(actual) == len(expected), (
        f"row count mismatch: spark={len(actual)} duckdb={len(expected)}"
    )
    if actual and expected:
        assert len(actual[0]) == len(expected[0]), "column count mismatch"
    assert sorted(actual, key=repr) == sorted(expected, key=repr)
