"""Golden gate: every registered t2 query hash-matches its DuckDB oracle.

Mirrors the driver's CORRECTNESS check (and the reference's
compareResultsByLinesInMemory order-insensitive philosophy, SURVEY §5) so
regressions surface in-repo before the driver runs.
"""

from __future__ import annotations

import pytest

from incubator_flink_old_spark.queries import ORACLES, QUERIES, load_all_queries
from tests.conftest import assert_matches_oracle

load_all_queries()


def test_registry_nonempty():
    assert "q_tpch_q3" in QUERIES


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    assert_matches_oracle(QUERIES[name](spark, sf_dir), duck, ORACLES[name])


#: DuckDB result types the driver's pandas canonicalizer mangles:
#: HUGEINT/UHUGEINT arrive as float64/object while Spark sends int64
#: (the q_tpch_q12 r03 failure — SUM(INTEGER) widens to HUGEINT), and
#: list/struct/map columns arrive as unhashable numpy arrays (the r02
#: q_agg_collect class). Oracles must CAST sums to BIGINT and encode
#: arrays as scalars (to_json / array_to_string).
_BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT")


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_driver_safe(name, duck):
    """Structural tripwire (VERDICT r03 item 7): DESCRIBE every oracle and
    reject result columns whose DuckDB type the driver canonicalizes
    differently from Spark's wire type — catching the whole class at
    registration time instead of one driver round per query."""
    rows = duck.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if typ.upper() in _BANNED_DUCK_TYPES
        or typ.endswith("[]")
        or typ.upper().startswith(("STRUCT", "MAP("))
    ]
    assert not bad, (
        f"oracle {name} produces driver-unsafe column types {bad}; "
        "CAST integer sums to BIGINT and scalar-encode arrays"
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns
