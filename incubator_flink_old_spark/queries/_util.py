"""Shared helpers for the t2 query modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_old_spark.sources import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dsum(col, alias: str, scale: int = 6) -> Column:
    """Bit-stable double sum (see aggregates.exact_sum); SQL twin is
    CAST(SUM(CAST(x AS DECIMAL(27,scale))) AS DOUBLE)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(27,{scale})")).cast("double").alias(alias)


def davg(col, alias: str, scale: int = 6) -> Column:
    """Bit-stable double mean: exact decimal sum cast to double, THEN an
    IEEE double division by the exact count — identical in any engine.
    (Dividing while still decimal is NOT portable: engines disagree on
    division result scale/rounding.)"""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(f"decimal(27,{scale})")).cast("double") / F.count(c)).alias(alias)


SQL_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(27,6))) AS DOUBLE)"
SQL_DAVG = "CAST(SUM(CAST({x} AS DECIMAL(27,6))) AS DOUBLE) / COUNT({x})"


def sql_dsum(x: str) -> str:
    return SQL_DSUM.format(x=x)


def sql_davg(x: str) -> str:
    return SQL_DAVG.format(x=x)
