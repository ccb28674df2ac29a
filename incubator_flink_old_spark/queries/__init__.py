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
    "llm_ops26",
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
    # --- round-7 rotation (VERDICT r06 item 1 + ADVICE r06 item 1):
    # --- all 244 queries are driver-green, so the window is pure
    # --- re-confirmation budget. Composition: (a) q_iterate_cc — the
    # --- one remaining r01-latest row, a flagship delta-iteration
    # --- query; (b) the 5 queries whose SHARED CODE changed in r06
    # --- (cosine→cosine_safe in grid_ivf/_grid_probes, the _sql_cos
    # --- oracle guard, the _sq_ctes/_two_stage_topk refactors) but
    # --- got no fresh r06 row — the code-changed-queries-re-front
    # --- discipline outranks pure age; (c) the full 44-query r02
    # --- tier oldest-first in registration order (tools/
    # --- rotation_age.py re-derives the ordering from the
    # --- CORRECTNESS union). Round-7 additions auto-front ahead via
    # --- _apply_driver_priority, rolling this list's tail to r08
    # --- along with the r03 tier.
    "q_iterate_cc",
    "q_ann_recall_ivf",
    "q_ann_recall_ivf_layout",
    "q_ivf_cell_purity",
    "q_ann_recall_sq8",
    "q_retrieval_two_stage",
    "q_pregel_sssp",
    "q_transitive_closure",
    "q_triangles",
    "q_iterate_pagerank",
    "q_iterate_kmeans",
    "q_wordcount",
    "q_text_stats",
    "q_text_quality",
    "q_text_lang_id",
    "q_text_fingerprint",
    "q_text_dedup",
    "q_text_simhash",
    "q_simhash_pairs",
    "q_dedup_ngram",
    "q_sim_topk",
    "q_sim_ivf_topk",
    "q_sim_lsh_pairs",
    "q_multimodal_pipeline",
    "q_text_scrub",
    "q_text_vocab",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_asof_join",
    "q_range_join",
    "q_pivot",
    "q_agg_percentile",
    "q_sample_hash",
    "q_explode_pos",
    "q_agg_grouping_sets",
    "q_unpivot",
    "q_fn_regex",
    "q_subquery_exists",
    "q_window_frames",
    "q_window_ntile",
    "q_dedup_cluster",
    "q_text_chunks",
    "q_training_corpus",
    "q_sample_stratified",
    "q_text_repetition",
    "q_decontaminate",
    "q_domain_cap",
    "q_semantic_dedup",
    "q_broadcast_filter",
    "q_profile_table",
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
