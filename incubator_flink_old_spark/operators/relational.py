"""Row-wise transforms & set ops (SURVEY.md §2.2 P1–P5, §2.6 U1–U3).

Reference sites (SURVEY citations; checkout was empty, paths are public
knowledge of the Stratosphere tree):
- MapOperator.java -> MapDriver / ChainedMapDriver
- FlatMapOperator.java -> FlatMapDriver
- FilterOperator.java (runtime: conditional-emit FlatMap)
- ProjectOperator.java (positional tuple projection)
- DistinctOperator.java (combinable GroupReduce underneath)
- UnionOperator.java / BinaryUnionNode (bag union, no dedup)
- shipping/OutputEmitter.java (PARTITION_HASH / PARTITION_RANGE / FORWARD)

Design: every combinator takes/returns DataFrames and accepts Column
expressions (the engine's "scalar function library" — the reference had
none, all scalar work was user Java). A Python-callable variant is offered
where the reference semantics are "arbitrary user code": it runs as
mapInPandas (Arrow-batched), the engine's sanctioned slow path.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Union

import pandas as pd
from pyspark.sql import Column, DataFrame

ColumnOrName = Union[Column, str]


def map_(df: DataFrame, *exprs: ColumnOrName) -> DataFrame:
    """P1 map(MapFunction): 1→1 transform.

    Relational form: a projection of Column expressions (Catalyst-visible,
    whole-stage-codegen'd). For opaque per-record logic use
    ``map_pandas``.
    """
    return df.select(*exprs)


def map_pandas(df: DataFrame, fn: Callable[[pd.DataFrame], pd.DataFrame], schema) -> DataFrame:
    """P1 map with arbitrary user code — Arrow-batched mapInPandas.

    Mirrors the reference's opaque MapFunction; each batch is a pandas
    DataFrame, fn may change both values and arity (so it also covers
    FlatMap-shaped code when row counts change).
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(_run, schema=schema)


def flat_map(df: DataFrame, explode_col: Column, alias: str, *keep: ColumnOrName) -> DataFrame:
    """P2 flatMap(FlatMapFunction): 1→N.

    Relational form: explode an array-typed expression. ``keep`` columns are
    carried alongside (the Collector pattern: emit N records per input).
    """
    return df.select(*keep, explode_col.alias(alias))


def filter_(df: DataFrame, predicate: Column) -> DataFrame:
    """P3 filter(FilterFunction): predicate keep/drop.

    Expressed as a Column predicate so Catalyst pushes it into the scan
    (the reference could never push filters — FilterFunction was opaque).
    """
    return df.filter(predicate)


def project(df: DataFrame, *cols: ColumnOrName) -> DataFrame:
    """P4 project(fields...): column selection (positional in the reference,
    named here). Catalyst turns this into scan-level column pruning."""
    return df.select(*cols)


def distinct(df: DataFrame, *keys: str) -> DataFrame:
    """P5 distinct() / distinct(keys).

    Full-row dedup, or key-based dedup keeping an arbitrary row per key
    (the reference's key-distinct keeps an arbitrary representative too —
    it is a combinable GroupReduce emitting the first record of each
    group). Map-side partial aggregation is Spark-built-in.
    """
    if keys:
        return df.dropDuplicates(list(keys))
    return df.distinct()


def union_all(*dfs: DataFrame) -> DataFrame:
    """U1 union(other): bag union, no dedup, same schema both sides.

    ``unionByName`` guards against positional mixups; the reference
    requires identical record types, we require identical column names.
    """
    out = dfs[0]
    for other in dfs[1:]:
        out = out.unionByName(other)
    return out


def intersect(left: DataFrame, right: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    """U2 intersect — absent in the reference (engine extension)."""
    return left.intersectAll(right) if keep_duplicates else left.intersect(right)


def except_all(left: DataFrame, right: DataFrame, keep_duplicates: bool = True) -> DataFrame:
    """U2 except — absent in the reference (engine extension)."""
    return left.exceptAll(right) if keep_duplicates else left.subtract(right)


def partition_by_hash(df: DataFrame, *keys: str, num_partitions: int | None = None) -> DataFrame:
    """U3 partitionByHash — explicit hash repartitioning (OutputEmitter
    PARTITION_HASH). Pre-partitioning lets a later co-located join/agg on
    the same keys reuse the exchange instead of re-shuffling."""
    if num_partitions is None:
        return df.repartition(*keys)
    return df.repartition(num_partitions, *keys)


def rebalance(df: DataFrame, num_partitions: int) -> DataFrame:
    """U3 rebalance — round-robin redistribute to fight skew."""
    return df.repartition(num_partitions)
