"""t2 query registry (SURVEY.md §2.11).

Every implemented operator from the SURVEY §2 inventory lands here as a
named query ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
a DuckDB oracle string over the pre-registered views. The driver runs both
sides at sf0.01 and hash-compares; bench runs a headline subset at sf0.1.

Registration protocol: modules call ``register(name, oracle=...)`` as a
decorator. Column names are aliased identically in the Spark code and the
oracle SQL — the driver's comparator sorts columns by name before hashing.
Double-typed aggregates route through ``exact_sum``/matching
``CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE)`` SQL so both engines
produce bit-identical, partition-order-independent values.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a t2 query; ``oracle=None`` → driver does a rows-only check
    (reserved for genuinely non-SQL-expressible ops, SURVEY §2.11)."""

    def deco(fn: QueryFn) -> QueryFn:
        from incubator_flink_old_spark.session import prep_session

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            prep_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def load_all_queries() -> None:
    """Import every query module (side effect: fills QUERIES/ORACLES)."""
    from incubator_flink_old_spark.queries import (  # noqa: F401
        relational,
        joins,
        aggregates,
        functions_scalar,
        windows,
        iterations,
        llm_ops,
        extensions,
        extensions2,
    )


__all__ = ["QUERIES", "ORACLES", "register", "load_all_queries"]
