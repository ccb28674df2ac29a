"""t2 query registry (SURVEY.md §2.11).

Every implemented operator from the SURVEY §2 inventory lands here as a
named query ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
a DuckDB oracle string over the pre-registered views. The driver runs both
sides at sf0.01 and hash-compares; bench runs a headline subset at sf0.1.

Registration protocol: modules call ``register(name, oracle=...)`` as a
decorator. Column names are aliased identically in the Spark code and the
oracle SQL — the driver's comparator sorts columns by name before hashing.
Double-typed aggregates route through ``dsum``/``sql_dsum`` (plain
DECIMAL(27,6)-cast sums on both engines — see _util.dsum for the exact
contract) so both sides produce bit-identical, partition-order-independent
values.
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
    "tpch_full",
    "llm_ops2",
    "llm_ops3",
    "llm_ops4",
    "llm_ops5",
    "llm_ops6",
    "llm_ops7",
    "llm_ops8",
    "llm_ops9",
    "llm_ops10",
    "llm_ops11",
    "llm_ops12",
    "llm_ops13",
    "llm_ops14",
    "llm_ops15",
    "llm_ops16",
    "llm_ops17",
    "llm_ops18",
    "llm_ops19",
    "llm_ops20",
    "llm_ops21",
    "llm_ops22",
    "llm_ops23",
    "llm_ops24",
    "llm_ops25",
    "analytics",
    "analytics2",
    "surfaces",
)

LOAD_ERRORS: dict[str, str] = {}

#: Driver-check priority. The round-1 driver verified exactly the FIRST 50
#: registered queries (CORRECTNESS_r01.json == list(QUERIES)[:50]); the rest
#: ran only in bench. Queries named here are moved to the front of the
#: registry so the driver's next CORRECTNESS pass covers the queries that do
#: not yet have a green driver row (round-1 gap list, VERDICT.md item 1) and
#: any newly added ones. Already-green queries keep their relative order
#: after the priority block. Purely an ordering hint — every query stays
#: registered and runnable regardless.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- round-6 rotation (VERDICT r05 item 1): 242/242 queries are
    # --- driver-green, so the window is pure re-confirmation budget.
    # --- These are the 49 queries whose latest green row is r01 —
    # --- checked once, three fixture generations ago — oldest-first
    # --- in registration order (tools/rotation_age.py re-derives the
    # --- ordering from the CORRECTNESS union). Round-6 additions
    # --- (q_ann_recall_ivfsq8, q_stream_asof_parity, ...) auto-front
    # --- ahead of these re-checks via _apply_driver_priority, so the
    # --- tail of this list rolls to r07 along with the r02 tier.
    "q_tpch_q1",
    "q_tpch_q10",
    "q_source_range",
    "q_map_project_arith",
    "q_flatmap_explode",
    "q_filter_pred",
    "q_project",
    "q_distinct",
    "q_union_all",
    "q_intersect",
    "q_except",
    "q_sink_global_sort",
    "q_topk_global",
    "q_map_pandas",
    "q_tpch_q14",
    "q_tpch_q18",
    "q_join_inner",
    "q_join_broadcast",
    "q_join_semi",
    "q_join_anti",
    "q_join_left_outer",
    "q_cogroup_outer",
    "q_cross_theta",
    "q_weblog_antijoin",
    "q_cogroup_pandas",
    "q_groupby_reduce_sum",
    "q_agg_sum_min_max",
    "q_agg_count_avg",
    "q_agg_global",
    "q_agg_distinct_count",
    "q_agg_rollup",
    "q_agg_cube",
    "q_groupreduce_topk_per_group",
    "q_secondary_sort",
    "q_accumulator_histogram",
    "q_fn_string",
    "q_fn_date",
    "q_fn_math",
    "q_fn_conditional",
    "q_fn_array",
    "q_fn_json",
    "q_window_tumbling",
    "q_window_sliding",
    "q_session_window",
    "q_event_dedup",
    "q_window_rank",
    "q_window_running_sum",
    "q_window_lag",
    "q_iterate_cc",
)


_DRIVER_GREEN: Optional[frozenset] = None


def _driver_green() -> frozenset:
    """Names with a green CORRECTNESS_r*.json row (union over rounds).
    Reads the driver artifacts at the repo root (two levels above this
    package) ONCE per process — the artifacts only change between
    rounds, and load_all_queries runs in every bench/test/driver
    session. Missing/corrupt files contribute no green rows, which only
    ever *fronts more* queries — always safe for the rotation
    invariant."""
    global _DRIVER_GREEN
    if _DRIVER_GREEN is not None:
        return _DRIVER_GREEN
    import glob
    import json
    import os

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except Exception:
            continue
        for name, row in rows.items():
            if (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False  # rows-only checks
            ):
                green.add(name)
    _DRIVER_GREEN = frozenset(green)
    return _DRIVER_GREEN


def _apply_driver_priority() -> None:
    """Reorder QUERIES/ORACLES in place: every query lacking a green
    driver row first — DRIVER_PRIORITY's un-green names in their listed
    order, then other un-green queries in registration order — and only
    THEN DRIVER_PRIORITY's green re-check names, then everything else.
    Un-green-before-re-checks is structural: a newly registered query
    can never be stranded outside the 50-slot window by a tuple padded
    with re-confirmations (VERDICT r03 item 2, tightened in r05 when
    exactly that happened with a full window)."""
    green = _driver_green()
    front = [n for n in DRIVER_PRIORITY if n in QUERIES and n not in green]
    seen = set(front)
    front += [n for n in QUERIES if n not in green and n not in seen]
    seen.update(front)
    front += [n for n in DRIVER_PRIORITY if n in QUERIES and n not in seen]
    front_set = set(front)
    rest = [n for n in QUERIES if n not in front_set]
    for mapping in (QUERIES, ORACLES):
        ordered = {n: mapping[n] for n in front + rest if n in mapping}
        mapping.clear()
        mapping.update(ordered)


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
    _apply_driver_priority()


__all__ = ["QUERIES", "ORACLES", "register", "load_all_queries"]
