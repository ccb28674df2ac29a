"""Joins, coGroup, cross (SURVEY.md §2.3 J1–J8).

Reference sites (public Stratosphere tree; SURVEY §2.3):
- JoinOperator.java -> MatchDriver; hybrid hash (MutableHashTable.java,
  Build{First,Second}HashMatchIterator) and sort-merge
  (MergeMatchIterator.java) physical strategies
- CoGroupOperator.java -> CoGroupDriver + SortMergeCoGroupIterator
- CrossOperator.java -> CrossDriver (block-nested-loop w/ resettable
  iterators)
- JoinHint enum (BROADCAST_HASH_*, REPARTITION_*) on JoinOperatorBase

The reference supports ONLY inner equi-joins ("Match"); outer/semi/anti
are idioms over coGroup. This engine exposes them first-class (Spark has
them natively) and leaves physical strategy to Catalyst + AQE, with the
broadcast hint surfaced for the reference's joinWithTiny.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: J1/J7/J8 modes. Reference-native: "inner" only. Engine extensions map to
#: Spark's first-class modes (the reference's coGroup idioms).
JOIN_MODES = ("inner", "left", "right", "full", "left_semi", "left_anti", "cross")


def join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
    hint: str | None = None,
) -> DataFrame:
    """J1/J4: join(other).where(k).equalTo(k) with optional strategy hint.

    ``hint`` mirrors the reference JoinHints: "broadcast" (joinWithTiny →
    BROADCAST_HASH_*), "shuffle_hash" (REPARTITION_HASH_*), "merge"
    (REPARTITION_SORT_MERGE). Unhinted, Catalyst/AQE choose — which is the
    right default at 100TB (AQE can swap to broadcast at runtime when the
    built side turns out small).
    """
    if hint == "broadcast":
        right = F.broadcast(right)
    elif hint in ("shuffle_hash", "merge"):
        right = right.hint(hint)
    elif hint is not None:
        raise ValueError(f"unknown join hint: {hint!r}")
    return left.join(right, on=on, how=how)


def cross(left: DataFrame, right: DataFrame, predicate: Column | None = None) -> DataFrame:
    """J6: cross(other) — Cartesian product; theta-join when a predicate is
    given (reference idiom: cross + filter in the UDF).

    Catalyst pushes the predicate into BroadcastNestedLoopJoin when one
    side is small. At 100TB an unpruned cross is never acceptable — callers
    in the engine's library always pass a predicate or pre-bucket
    (see similarity.py for the LSH-bucketed pattern).
    """
    out = left.crossJoin(right)
    return out.filter(predicate) if predicate is not None else out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-buster equi-join: salt the (skewed) left side's key into
    ``salt`` sub-keys and explode the right side across all salts, so one
    hot key spreads over ``salt`` reducers instead of melting one.

    AQE's skew-join splitting (on by default in this engine) handles most
    cases at runtime; explicit salting remains the tool when a single key
    exceeds what one task can hold even after AQE splits — the classic
    power-law key at 100TB. Cost: right side replicated ×salt — use only
    with a moderate right side, or pre-filter to the hot keys.

    ``how`` is restricted to left-preserving joins: because the right side
    is exploded ×salt, a right/full outer join would emit each unmatched
    right row once PER SALT COPY instead of once — wrong multiplicity.
    Flip the inputs (the skewed side must be left anyway) for right-skew.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti", "cross"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the exploded right side "
            "would duplicate unmatched right rows; use a left-preserving join "
            "and put the skewed side on the left"
        )
    lsalted = left.withColumn(
        "__salt", (F.crc32(F.col(left_key).cast("string")) % salt).cast("int")
    )
    rsalted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    cond = (lsalted[left_key] == rsalted[right_key]) & (
        lsalted["__salt"] == rsalted["__salt"]
    )
    return lsalted.join(rsalted, on=cond, how=how).drop("__salt")


def co_group(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    right_keys: list[str],
    fn: Callable[[object, pd.DataFrame, pd.DataFrame], pd.DataFrame],
    schema,
) -> DataFrame:
    """J5: coGroup(other).where(k1).equalTo(k2) — exact semantics.

    Both groups sharing a key are handed to ``fn`` together; keys present
    on only ONE side still fire with an empty counterpart (full-outer
    behavior — SURVEY §7.3 hard part 2; this is how the reference expressed
    outer/anti joins). Spark's cogrouped-pandas applyInPandas matches this
    exactly: one Arrow batch pair per key, empty DataFrame for the absent
    side.

    The inputs are hash-repartitioned on their keys to an EXPLICIT width
    (max of cluster parallelism and the session's shuffle partitions)
    before the cogroup: a Python-boundary stage is priced per GROUP
    (Arrow batch pair + fn call each), not per byte, and AQE's
    byte-based partition coalescing collapses a small-byte shuffle to
    ~1 task, serializing every group through one worker — measured 6.5 s
    → 1.8 s wall on the sf0.1 cogroup row (optimization round 12,
    guide §4). An explicit numPartitions is exempt from AQE coalescing;
    the cogroup reuses the partitioning, so no extra exchange appears.
    """

    def _run(key: tuple, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        return fn(key, lpdf, rpdf)

    spark = left.sparkSession
    width = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    if not left.isStreaming:
        left = left.repartition(width, *left_keys)
    if not right.isStreaming:
        right = right.repartition(width, *right_keys)
    return (
        left.groupBy(*left_keys)
        .cogroup(right.groupBy(*right_keys))
        .applyInPandas(_run, schema=schema)
    )


def co_group_relational(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    right_keys: list[str],
    left_aggs: list[Column],
    right_aggs: list[Column],
) -> DataFrame:
    """J5 relational form: per-side pre-aggregation + full-outer join.

    When the coGroup body is expressible as aggregates over each side's
    iterator, this shape keeps everything JVM-side: groupBy partial-aggs on
    both sides then a full_outer equi-join on the key. Far cheaper at scale
    than shipping groups to Python.

    Output: one coalesced key column per left key name (keys existing on
    either side appear exactly once, like the reference CoGroupFunction's
    single key argument), then the left aggs, then the right aggs.
    """
    rk_names = [f"__rk_{i}" for i in range(len(right_keys))]
    lagg = left.groupBy(*left_keys).agg(*left_aggs)
    ragg = right.groupBy(*right_keys).agg(*right_aggs)
    for rk, tmp in zip(right_keys, rk_names):
        ragg = ragg.withColumnRenamed(rk, tmp)
    cond = [lagg[lk] == ragg[tmp] for lk, tmp in zip(left_keys, rk_names)]
    joined = lagg.join(ragg, on=cond, how="full_outer")
    key_cols = [
        F.coalesce(F.col(lk), F.col(tmp)).alias(lk)
        for lk, tmp in zip(left_keys, rk_names)
    ]
    val_cols = [c for c in joined.columns if c not in set(left_keys) | set(rk_names)]
    return joined.select(*key_cols, *val_cols)


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    on: str,
    set_when_matched: dict[str, Column],
    insert_values: dict[str, Column],
    delete_when: Column | None = None,
) -> DataFrame:
    """MERGE INTO semantics (SURVEY §2.1 sink family: the upsert a CDC
    feed applies to a dimension) as one declarative full-outer join —
    WHEN MATCHED [AND delete_when] THEN DELETE / THEN UPDATE SET,
    WHEN NOT MATCHED THEN INSERT.

    ``set_when_matched`` / ``insert_values`` map base-column names to
    expressions over the joined row (base columns + change columns);
    unnamed base columns pass through unchanged on update and become
    NULL on insert unless listed. ``delete_when`` is evaluated only on
    matched rows.

    Scale shape: ONE shuffle on the merge key (or zero if both sides are
    bucketed by it); no driver-side row handling. AQE broadcasts the
    changes side when a CDC batch is small — the common case — making
    the merge a map-only pass over the base table. At 100 TB the output
    is written back partition-aligned, so unchanged partitions can be
    skipped entirely by a writer that diffs partition membership.

    NULL-key semantics (ANSI MERGE contracts, pinned by
    tests/test_wave29.py): a NULL merge key never equals anything, so a
    NULL-keyed BASE row matches no change and passes through UNCHANGED
    (it must not be rewritten via the INSERT arm), while a NULL-keyed
    CHANGE row is NOT MATCHED and fires the insert arm. Side presence is
    therefore tracked with literal marker columns, not key-nullness —
    `__b.on IS NULL` alone misclassifies an existing NULL-keyed base row
    as an insert (ADVICE r05). Duplicate keys in ``changes`` fan out the
    matched base row once per change row (ANSI MERGE raises an error
    here; deduplicate the CDC batch first if that matters).
    """
    b = base.withColumn("__b_present", F.lit(True)).alias("__b")
    c = changes.withColumn("__c_present", F.lit(True)).alias("__c")
    joined = b.join(c, F.col(f"__b.{on}") == F.col(f"__c.{on}"), "full_outer")
    b_present = F.coalesce(F.col("__b.__b_present"), F.lit(False))
    c_present = F.coalesce(F.col("__c.__c_present"), F.lit(False))
    matched = b_present & c_present
    insert_only = c_present & ~b_present
    if delete_when is not None:
        # A matched tombstone deletes; an UNMATCHED tombstone is a no-op
        # (SQL MERGE's NOT MATCHED arm never fires for delete changes) —
        # without the second clause a tombstone for an absent key would
        # resurrect it as an insert. coalesce() keeps the three-valued
        # logic from dropping base-only rows (delete_when is NULL there).
        keep = ~F.coalesce(
            (matched | insert_only) & delete_when, F.lit(False)
        )
    else:
        keep = F.lit(True)
    out_cols = []
    for name in base.columns:
        upd = set_when_matched.get(name, F.col(f"__b.{name}"))
        ins = insert_values.get(
            name,
            F.col(f"__c.{on}") if name == on else F.lit(None),
        )
        out_cols.append(
            F.when(insert_only, ins)
            .when(matched, upd)
            .otherwise(F.col(f"__b.{name}"))
            .alias(name)
        )
    return joined.filter(keep).select(*out_cols)


def checked_bigint(col: Column, msg: str) -> Column:
    """Decimal→BIGINT cast that FAILS LOUDLY past 2^63−1: Spark's
    non-ANSI decimal→bigint cast silently returns NULL on overflow
    while an ANSI engine (the DuckDB oracles) raises — a NULL-vs-error
    divergence at the boundary (review finding on
    ``q_join_hotkeys``). assert_true makes both engines fail
    identically; below the boundary the cast is exact and the guard is
    codegen-friendly column algebra (no UDF). Both bounds are guarded —
    a value below −2^63 silently NULLs under the same non-ANSI cast
    (review finding; the hotkeys caller is non-negative, but the helper
    is general). A NULL input PASSES THROUGH as NULL — without the
    isNull arm, ``fits`` evaluates NULL and assert_true(NULL) throws,
    misreporting a NULL as overflow (ADVICE r11; unreachable at the
    hotkeys call site, but the helper is advertised as general and a
    cast of NULL is NULL on both engines)."""
    fits = col.isNull() | (
        (col <= F.lit("9223372036854775807").cast("decimal(38,0)"))
        & (col >= F.lit("-9223372036854775808").cast("decimal(38,0)"))
    )
    return F.when(
        F.assert_true(fits, F.lit(msg)).isNull(), col.cast("bigint")
    )


def join_hotkey_audit(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
    threshold: int = 1_000_000,
) -> DataFrame:
    """Pre-flight SKEW DETECTOR for an equi-join — the audit you run
    BEFORE a 100 TB join to find the keys that would explode it: per
    join key, each side's row count and their product (the key's exact
    output cardinality under an inner equi-join), flagged ``hot`` at
    ``threshold``. Hot keys are what :func:`salted_join` (the standing
    mitigation) and AQE's skew-join splitting exist for — this operator
    tells you WHICH keys and HOW BAD before the shuffle is paid, from
    two digest-sized count aggregations instead of the join itself.

    Self-join audits (funnels, transition mining, pair generation) pass
    the same frame twice — est_rows is then count², the quadratic blowup
    a single celebrity key hides until the join OOMs.

    Scale: one combinable groupBy per side (map-side partials, shuffle =
    distinct keys, never the rows), one equi-join of the two count
    digests. Returns (key, cnt_left, cnt_right, est_rows, hot) —
    ``est_rows`` is DECIMAL(38,0): a celebrity key with >~3e9 rows per
    side puts count² past 2^63, and under non-ANSI SQL a BIGINT product
    would silently wrap NEGATIVE, reporting the one key most likely to
    OOM the join as not hot (review finding); the decimal product is
    exact to 10^38 on both engines.
    """
    right_key = right_key or left_key
    lc = left.groupBy(F.col(left_key).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt_left")
    )
    rc = right.groupBy(F.col(right_key).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt_right")
    )
    return (
        lc.join(rc, on="key")
        .withColumn(
            "est_rows",
            (
                F.col("cnt_left").cast("decimal(19,0)")
                * F.col("cnt_right").cast("decimal(19,0)")
            ).cast("decimal(38,0)"),
        )
        .withColumn(
            "hot", F.col("est_rows") >= F.lit(threshold).cast("decimal(38,0)")
        )
    )
