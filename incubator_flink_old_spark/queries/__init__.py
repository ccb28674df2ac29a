"""t2 query registry (SURVEY.md §2.11).

Every implemented operator from the SURVEY §2 inventory lands here as a
named query ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
a DuckDB oracle string over the pre-registered views. The driver runs both
sides at sf0.01 and hash-compares; bench runs a headline subset at sf0.1.

Registration protocol: modules call ``register(name, oracle=...)`` as a
decorator. Column names are aliased identically in the Spark code and the
oracle SQL — the driver's comparator sorts columns by name before hashing.
Double-typed aggregates route through ``dsum``/``sql_dsum`` (decimal-cast
sums with a VARCHAR hop on the DuckDB side — see _util.dsum for why) so
both engines produce bit-identical, partition-order-independent values.
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


#: Query modules, imported by name so one broken module can't take down
#: the whole registry (the driver should always see every healthy query).
_QUERY_MODULES = (
    "relational",
    "joins",
    "aggregates",
    "functions_scalar",
    "windows",
    "iterations",
    "llm_ops",
    "extensions",
    "extensions2",
)

LOAD_ERRORS: dict[str, str] = {}


def load_all_queries() -> None:
    """Import every query module (side effect: fills QUERIES/ORACLES).

    Import failures are recorded in LOAD_ERRORS instead of raised — a
    regression in one module must not hide the rest from the driver.
    """
    import importlib
    import sys
    import traceback

    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(f"incubator_flink_old_spark.queries.{mod}")
        except Exception:
            LOAD_ERRORS[mod] = traceback.format_exc()
            print(
                f"incubator_flink_old_spark: query module {mod!r} failed to load:\n"
                + LOAD_ERRORS[mod],
                file=sys.stderr,
            )


__all__ = ["QUERIES", "ORACLES", "register", "load_all_queries"]
