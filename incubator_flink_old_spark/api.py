"""DataSet-style fluent API (SURVEY §1.1, §3.1–§3.3 — the reference's
user surface).

A thin compatibility veneer so a program written against the reference's
Java/Scala DataSet API ports statement-for-statement:

    env = ExecutionEnvironment.get_execution_environment()
    text = env.read_text_file(path)
    counts = (text.flat_map_expr(F.explode(F.split(F.lower("value"), r"\\s+")), "word")
                  .filter(F.col("word") != "")
                  .group_by("word").count())
    counts.write_as_csv(out)
    env.execute("WordCount")

Everything delegates to the operator layer (operators/*.py) and stays a
lazy DataFrame underneath — Catalyst sees through the whole program. The
lifecycle mirrors the reference: transformations build the DAG, sinks
register, ``env.execute()`` runs them (multi-sink plans run sink-by-sink;
Spark caches shared scan stages via exchange reuse).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_old_spark.operators import aggregates as _agg
from incubator_flink_old_spark.operators import iterations as _iter
from incubator_flink_old_spark.operators import joins as _joins
from incubator_flink_old_spark.operators import relational as _rel
from incubator_flink_old_spark.session import get_spark, prep_session
from incubator_flink_old_spark import sources as _sources


@dataclass
class _PendingSink:
    description: str
    action: Callable[[], None]


class ExecutionEnvironment:
    """Reference: ExecutionEnvironment.getExecutionEnvironment() —
    program entry, source factory, sink registry, execute()."""

    def __init__(self, spark: SparkSession):
        self.spark = prep_session(spark)
        self._sinks: list[_PendingSink] = []

    @classmethod
    def get_execution_environment(cls, spark: SparkSession | None = None) -> "ExecutionEnvironment":
        return cls(spark or get_spark())

    # -- sources (SURVEY §2.1) --------------------------------------------
    def from_elements(self, rows: list, schema) -> "DataSet":
        return DataSet(self, _sources.from_elements(self.spark, rows, schema))

    from_collection = from_elements

    def generate_sequence(self, start: int, end: int) -> "DataSet":
        return DataSet(self, _sources.generate_sequence(self.spark, start, end))

    def read_text_file(self, path: str) -> "DataSet":
        return DataSet(self, _sources.read_text(self.spark, path))

    def read_csv_file(self, path: str, schema, **kwargs) -> "DataSet":
        return DataSet(self, _sources.read_csv(self.spark, path, schema, **kwargs))

    def read_parquet(self, path: str) -> "DataSet":
        return DataSet(self, self.spark.read.parquet(path))

    def read_table(self, sf_dir: str, name: str) -> "DataSet":
        return DataSet(self, _sources.load_table(self.spark, sf_dir, name))

    # -- lifecycle ---------------------------------------------------------
    def register_sink(self, description: str, action: Callable[[], None]) -> None:
        self._sinks.append(_PendingSink(description, action))

    def execute(self, job_name: str = "job") -> int:
        """Run every registered sink (the reference's lazy multi-sink
        plan execution); returns the number of sinks executed."""
        ran = 0
        for sink in self._sinks:
            sink.action()
            ran += 1
        self._sinks.clear()
        return ran


class DataSet:
    """Reference: api/java/DataSet — every transformation returns a new
    lazy DataSet; sinks register on the environment."""

    def __init__(self, env: ExecutionEnvironment, df: DataFrame):
        self.env = env
        self.df = df

    # -- row-wise (P1–P5) --------------------------------------------------
    def map(self, *exprs) -> "DataSet":
        return DataSet(self.env, _rel.map_(self.df, *exprs))

    def map_pandas(self, fn, schema) -> "DataSet":
        return DataSet(self.env, _rel.map_pandas(self.df, fn, schema))

    def flat_map_expr(self, explode_col: Column, alias: str, *keep) -> "DataSet":
        return DataSet(self.env, _rel.flat_map(self.df, explode_col, alias, *keep))

    def filter(self, predicate: Column) -> "DataSet":
        return DataSet(self.env, _rel.filter_(self.df, predicate))

    def project(self, *cols) -> "DataSet":
        return DataSet(self.env, _rel.project(self.df, *cols))

    def distinct(self, *keys: str) -> "DataSet":
        return DataSet(self.env, _rel.distinct(self.df, *keys))

    # -- set ops (U1–U3) ---------------------------------------------------
    def union(self, other: "DataSet") -> "DataSet":
        return DataSet(self.env, _rel.union_all(self.df, other.df))

    def partition_by_hash(self, *keys: str, num_partitions: int | None = None) -> "DataSet":
        return DataSet(
            self.env, _rel.partition_by_hash(self.df, *keys, num_partitions=num_partitions)
        )

    def rebalance(self, num_partitions: int) -> "DataSet":
        return DataSet(self.env, _rel.rebalance(self.df, num_partitions))

    # -- joins (J1–J8) -----------------------------------------------------
    def join(self, other: "DataSet", hint: str | None = None) -> "_JoinBuilder":
        return _JoinBuilder(self, other, how="inner", hint=hint)

    def join_with_tiny(self, other: "DataSet") -> "_JoinBuilder":
        return _JoinBuilder(self, other, how="inner", hint="broadcast")

    join_with_huge = join

    def left_outer_join(self, other: "DataSet") -> "_JoinBuilder":
        return _JoinBuilder(self, other, how="left")

    def right_outer_join(self, other: "DataSet") -> "_JoinBuilder":
        return _JoinBuilder(self, other, how="right")

    def full_outer_join(self, other: "DataSet") -> "_JoinBuilder":
        return _JoinBuilder(self, other, how="full")

    def co_group(self, other: "DataSet") -> "_CoGroupBuilder":
        return _CoGroupBuilder(self, other)

    def cross(self, other: "DataSet", predicate: Column | None = None) -> "DataSet":
        return DataSet(self.env, _joins.cross(self.df, other.df, predicate))

    cross_with_tiny = cross
    cross_with_huge = cross

    # -- grouping / aggregation (A1–A5, O1) -------------------------------
    def group_by(self, *keys: str) -> "_Grouping":
        return _Grouping(self, list(keys))

    def aggregate(self, *aggs) -> "DataSet":
        return DataSet(self.env, _agg.aggregate(self.df, [], *aggs))

    def reduce_group(self, fn, schema) -> "DataSet":
        """Whole-dataset group program (AllGroupReduce — parallelism-1
        final in the reference; one task here via a constant group key)."""
        grouped = self.df.withColumn("__all", F.lit(1))
        out = _agg.group_reduce(
            grouped, ["__all"], lambda pdf: fn(pdf.drop(columns="__all")), schema
        )
        return DataSet(self.env, out)

    # -- sort / limit (O2–O4) ---------------------------------------------
    def sort_partition(self, *order: Column) -> "DataSet":
        return DataSet(self.env, self.df.sortWithinPartitions(*order))

    def order_by(self, *order: Column) -> "DataSet":
        return DataSet(self.env, _agg.global_sort(self.df, *order))

    def first(self, n: int) -> "DataSet":
        return DataSet(self.env, _agg.first_n(self.df, n))

    # -- iterations (I1/I2) ------------------------------------------------
    def iterate(self, max_iterations: int, step, converged=None) -> "DataSet":
        out = _iter.bulk_iterate(
            self.df,
            lambda df, i: step(DataSet(self.env, df), i).df,
            max_iterations=max_iterations,
            converged=(
                None
                if converged is None
                else lambda p, c, i: converged(DataSet(self.env, p), DataSet(self.env, c), i)
            ),
        )
        return DataSet(self.env, out)

    def iterate_delta(self, workset: "DataSet", max_iterations: int, keys: list[str], step) -> "DataSet":
        def _step(sol: DataFrame, ws: DataFrame, i: int):
            d, w = step(DataSet(self.env, sol), DataSet(self.env, ws), i)
            return d.df, w.df

        out = _iter.delta_iterate(
            self.df, workset.df, _step, keys=keys, max_iterations=max_iterations
        )
        return DataSet(self.env, out)

    # -- sinks (S11/S12) ---------------------------------------------------
    def write_as_csv(self, path: str, order: list[Column] | None = None) -> None:
        df = self.df if order is None else self.df.orderBy(*order)
        self.env.register_sink(
            f"csv:{path}",
            lambda: df.write.mode("overwrite").option("header", "true").csv(path),
        )

    def write_as_text(self, path: str) -> None:
        df = self.df.select(
            F.concat_ws("|", *[F.col(c).cast("string") for c in self.df.columns]).alias("value")
        )
        self.env.register_sink(f"text:{path}", lambda: df.write.mode("overwrite").text(path))

    def write_as_parquet(self, path: str, order: list[Column] | None = None) -> None:
        df = self.df if order is None else self.df.orderBy(*order)
        self.env.register_sink(
            f"parquet:{path}", lambda: df.write.mode("overwrite").parquet(path)
        )

    def print_(self, n: int = 20) -> None:
        self.env.register_sink("print", lambda: self.df.show(n, truncate=False))

    # -- LLM-pipeline convenience surface (north-star W7 operators; the
    # -- full knobs live in operators/text.py and operators/similarity.py)
    def dedup_exact(self, text: str = "text", key: str = "doc_id") -> "DataSet":
        from incubator_flink_old_spark.operators.text import exact_dedup

        return DataSet(self.env, exact_dedup(self.df, text, key))

    def dedup_pairs(self, threshold: float = 0.7, **kw) -> "DataSet":
        from incubator_flink_old_spark.operators.text import minhash_lsh_pairs

        return DataSet(
            self.env, minhash_lsh_pairs(self.df, jaccard_threshold=threshold, **kw)
        )

    def dedup_clusters(self, **kw) -> "DataSet":
        from incubator_flink_old_spark.operators.text import dedup_clusters

        return DataSet(self.env, dedup_clusters(self.df, **kw))

    def chunk(self, chunk_tokens: int = 64, overlap: int = 8, **kw) -> "DataSet":
        from incubator_flink_old_spark.operators.text import chunk_documents

        return DataSet(
            self.env, chunk_documents(self.df, chunk_tokens, overlap, **kw)
        )

    def sample_stratified(
        self, strata: str, fractions: dict[str, float], **kw
    ) -> "DataSet":
        from incubator_flink_old_spark.operators.text import sample_stratified

        return DataSet(self.env, sample_stratified(self.df, strata, fractions, **kw))

    def curate(self, **kw) -> "DataSet":
        """The full curation pipeline (exact+fuzzy dedup, quality,
        repetition, language, decontamination, domain cap, PII-scrubbed
        materialization) — operators/text.curate."""
        from incubator_flink_old_spark.operators.text import curate

        return DataSet(self.env, curate(self.df, **kw))

    def dedup_templates(self, **kw) -> "DataSet":
        """Structural template groups — operators/text.template_dedup."""
        from incubator_flink_old_spark.operators.text import template_dedup

        return DataSet(self.env, template_dedup(self.df, **kw))

    def fuzzy_pairs(self, **kw) -> "DataSet":
        """Blocked edit-distance linkage pairs — operators/text.fuzzy_pairs."""
        from incubator_flink_old_spark.operators.text import fuzzy_pairs

        return DataSet(self.env, fuzzy_pairs(self.df, **kw))

    def resolve_entities(self, **kw) -> "DataSet":
        """Fuzzy linkage → components → entity ids —
        operators/text.resolve_entities."""
        from incubator_flink_old_spark.operators.text import resolve_entities

        return DataSet(self.env, resolve_entities(self.df, **kw))

    def tokenize(self, **kw) -> "DataSet":
        """Vocabulary-ranked token-id encoding — operators/text.tokenize_ids."""
        from incubator_flink_old_spark.operators.text import tokenize_ids

        return DataSet(self.env, tokenize_ids(self.df, **kw))

    def diff_against(self, new: "DataSet", **kw) -> "DataSet":
        """Snapshot diff vs a newer corpus version —
        operators/text.corpus_diff."""
        from incubator_flink_old_spark.operators.text import corpus_diff

        return DataSet(self.env, corpus_diff(self.df, new.df, **kw))

    def decontaminate(
        self, benchmark: "DataSet", bloom: bool = False, **kw
    ) -> "DataSet":
        """Eval-set leakage flags; bloom=True routes through the
        bit-array prefilter (operators/sketches.decontaminate_bloom —
        identical output, candidate-only verify volume)."""
        if bloom:
            from incubator_flink_old_spark.operators.sketches import (
                decontaminate_bloom as fn,
            )
        else:
            from incubator_flink_old_spark.operators.text import decontaminate as fn

        return DataSet(self.env, fn(self.df, benchmark.df, **kw))

    def heavy_hitters(self, threshold: int, **kw) -> "DataSet":
        """Exact values occurring ≥ threshold times (single-column input)
        — operators/sketches.heavy_hitters (candidate-only shuffle)."""
        from incubator_flink_old_spark.operators.sketches import heavy_hitters

        return DataSet(self.env, heavy_hitters(self.df, threshold, **kw))

    def ann_topk(
        self, queries: "DataSet", k: int = 5, method: str = "brute", **kw
    ) -> "DataSet":
        """Similarity top-k over an embedding column: method ∈
        {'brute', 'ivf', 'pq', 'ivfpq'} — exact baseline, cell-pruned,
        code-compressed, or both composed (operators/similarity)."""
        from incubator_flink_old_spark.operators import similarity as S

        fn = {
            "brute": S.brute_force_topk,
            "ivf": S.ivf_topk,
            "pq": S.pq_topk,
            "ivfpq": S.ivf_pq_topk,
        }[method]
        return DataSet(self.env, fn(queries.df, self.df, k=k, **kw))

    # -- actions (testing convenience; the reference's collect()) ---------
    def collect(self):
        return self.df.collect()

    def count(self) -> int:
        return self.df.count()


class _JoinBuilder:
    """join(other).where(keys...).equal_to(keys...) — the reference's
    key-declaration sugar."""

    def __init__(self, left: DataSet, right: DataSet, how: str, hint: str | None = None):
        self.left, self.right, self.how, self.hint = left, right, how, hint
        self._left_keys: list[str] | None = None

    def where(self, *keys: str) -> "_JoinBuilder":
        self._left_keys = list(keys)
        return self

    def equal_to(self, *keys: str) -> DataSet:
        assert self._left_keys is not None, "call .where(...) first"
        if list(keys) == self._left_keys:
            # same-name keys: name-list join → single deduped key column,
            # immune to self-join lineage ambiguity (iteration steps join
            # datasets derived from each other constantly)
            on = self._left_keys
        else:
            cond = None
            for lk, rk in zip(self._left_keys, keys):
                c = self.left.df[lk] == self.right.df[rk]
                cond = c if cond is None else (cond & c)
            on = cond
        out = _joins.join(self.left.df, self.right.df, on=on, how=self.how, hint=self.hint)
        return DataSet(self.left.env, out)


class _CoGroupBuilder:
    def __init__(self, left: DataSet, right: DataSet):
        self.left, self.right = left, right
        self._left_keys: list[str] | None = None
        self._right_keys: list[str] | None = None

    def where(self, *keys: str) -> "_CoGroupBuilder":
        self._left_keys = list(keys)
        return self

    def equal_to(self, *keys: str) -> "_CoGroupBuilder":
        self._right_keys = list(keys)
        return self

    def apply(self, fn, schema) -> DataSet:
        assert self._left_keys and self._right_keys
        out = _joins.co_group(
            self.left.df, self.right.df, self._left_keys, self._right_keys, fn, schema
        )
        return DataSet(self.left.env, out)


class _Grouping:
    """group_by(keys) → reduce/aggregate/sort_group sugar (reference:
    UnsortedGrouping/SortedGrouping)."""

    def __init__(self, ds: DataSet, keys: list[str]):
        self.ds, self.keys = ds, keys
        self._order: list[tuple[str, bool]] = []

    def aggregate(self, *aggs) -> DataSet:
        return DataSet(self.ds.env, _agg.aggregate(self.ds.df, self.keys, *aggs))

    def sum(self, col: str, alias: str | None = None) -> DataSet:
        return self.aggregate(("sum", col, alias or col))

    def min(self, col: str, alias: str | None = None) -> DataSet:
        return self.aggregate(("min", col, alias or col))

    def max(self, col: str, alias: str | None = None) -> DataSet:
        return self.aggregate(("max", col, alias or col))

    def count(self, alias: str = "count") -> DataSet:
        return self.aggregate(F.count(F.lit(1)).alias(alias))

    def reduce_group(self, fn, schema) -> DataSet:
        if self._order:
            out = _agg.secondary_sort_apply(self.ds.df, self.keys, self._order, fn, schema)
        else:
            out = _agg.group_reduce(self.ds.df, self.keys, fn, schema)
        return DataSet(self.ds.env, out)

    def sort_group(self, col: str, ascending: bool = True) -> "_Grouping":
        self._order.append((col, ascending))
        return self

    def first(self, n: int, order: list[Column]) -> DataSet:
        return DataSet(
            self.ds.env, _agg.top_k_per_group(self.ds.df, self.keys, order, n)
        )
