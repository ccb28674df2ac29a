"""Operator inventory (SURVEY.md §2) — the PACT algebra, Spark-first.

The reference's algebra is five second-order functions (map, reduce,
match/join, cross, cogroup) plus sources, sinks, union and iterations,
parameterized by opaque user Java code. This engine re-expresses each as a
DataFrame combinator so Catalyst sees the logic (predicate pushdown, column
pruning, join selection, partial aggregation — all absent in the reference
because its UDFs were opaque, SURVEY §4.1).
"""

from incubator_flink_old_spark.operators.relational import (
    distinct,
    except_all,
    filter_,
    flat_map,
    intersect,
    map_,
    partition_by_hash,
    project,
    rebalance,
    union_all,
)
from incubator_flink_old_spark.operators.joins import co_group, cross, join
from incubator_flink_old_spark.operators.aggregates import (
    aggregate,
    first_n,
    group_reduce,
    reduce_group_pandas,
    secondary_sort_apply,
    top_k,
    top_k_per_group,
)
from incubator_flink_old_spark.operators.iterations import bulk_iterate, delta_iterate

__all__ = [
    "aggregate",
    "bulk_iterate",
    "co_group",
    "cross",
    "delta_iterate",
    "distinct",
    "except_all",
    "filter_",
    "first_n",
    "flat_map",
    "group_reduce",
    "intersect",
    "join",
    "map_",
    "partition_by_hash",
    "project",
    "rebalance",
    "reduce_group_pandas",
    "secondary_sort_apply",
    "top_k",
    "top_k_per_group",
    "union_all",
]
