"""Training-data pipeline queries, wave 38: two scalar-library
completions — ARRAY SET ALGEBRA (array_union / array_intersect /
array_except / arrays_overlap, the set-typed complement of the
element-wise array functions q_fn_array covers) and TRY_* ERROR-SAFE
ARITHMETIC (try_divide / try_mod: the ANSI-mode posture where a bad
denominator yields NULL instead of a job-killing exception — at 100 TB
one poisoned row must never fail a stage).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import t

# ---------------------------------------------------------------------------
# Array set algebra
# ---------------------------------------------------------------------------

_ARRSET_ORACLE = r"""
    WITH toks AS (
        SELECT doc_id,
               list_distinct(list_filter(
                   string_split_regex(lower(text), '\s+'),
                   x -> x <> '')) AS tk
        FROM documents)
    SELECT a.doc_id,
           CAST(len(list_distinct(list_concat(a.tk, b.tk))) AS BIGINT)
               AS n_union,
           CAST(len(list_intersect(a.tk, b.tk)) AS BIGINT) AS n_inter,
           CAST(len(list_filter(a.tk, x -> NOT list_contains(b.tk, x)))
               AS BIGINT) AS n_only_a,
           len(list_intersect(a.tk, b.tk)) > 0 AS overlaps
    FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
    """


@register("q_fn_array_sets", oracle=_ARRSET_ORACLE)
def q_fn_array_sets(spark, sf_dir):
    """Array SET algebra between each document's token set and its
    successor's (doc_id + 1): |union|, |intersection|, |a \\ b|, and the
    overlap predicate — array_union / array_intersect / array_except /
    arrays_overlap exercised together on real token data, with the
    inclusion-exclusion law (|∪| = |a| + |b| − |∩|) holding row-wise by
    construction. Sizes and booleans only, so element ORDER (which the
    two engines need not share) never reaches the result.

    Scale: the successor join is an equi-join on doc_id+1 (range-local
    under an id-ordered layout); the set ops are narrow per-row
    expressions inside whole-stage codegen."""
    from incubator_flink_old_spark.operators.text import tokens

    docs = t(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", F.array_distinct(tokens("text")).alias("tk")
    )
    a = tk.select(F.col("doc_id"), F.col("tk").alias("ta"))
    b = tk.select((F.col("doc_id") - 1).alias("doc_id"), F.col("tk").alias("tb"))
    return a.join(b, on="doc_id").select(
        "doc_id",
        F.size(F.array_union("ta", "tb")).cast("long").alias("n_union"),
        F.size(F.array_intersect("ta", "tb")).cast("long").alias("n_inter"),
        F.size(F.array_except("ta", "tb")).cast("long").alias("n_only_a"),
        F.arrays_overlap("ta", "tb").alias("overlaps"),
    )


# ---------------------------------------------------------------------------
# try_* error-safe arithmetic
# ---------------------------------------------------------------------------

_TRY_ORACLE = """
    SELECT event_id,
           CAST(value AS DOUBLE) / NULLIF(user_id % 3, 0) AS safe_div,
           CASE WHEN user_id % 3 = 0 THEN NULL
                ELSE event_id % (user_id % 3) END AS safe_mod,
           CAST(value AS DOUBLE) / NULLIF(user_id % 3, 0) IS NULL
               AS was_poisoned
    FROM events
    """


@register("q_fn_try_arith", oracle=_TRY_ORACLE)
def q_fn_try_arith(spark, sf_dir):
    """TRY_* error-safe arithmetic: try_divide and try_mod turn a zero
    denominator into NULL instead of an exception — the ANSI-mode
    posture a 100 TB job needs, where one poisoned row out of 10^12
    must never kill a stage (the alternative, disabling ANSI globally,
    silently corrupts every OTHER overflow too). A third of the rows
    here carry a zero denominator (user_id % 3); the oracle is the
    explicit NULLIF guard the try_ functions replace.

    Scale: pure row-wise expressions in whole-stage codegen; the NULLs
    flow through downstream aggregates under standard SQL semantics
    (count skips, sum ignores), so the poison stays contained."""
    ev = t(spark, sf_dir, "events")
    denom = F.col("user_id") % 3
    return ev.select(
        "event_id",
        F.try_divide(F.col("value"), denom).alias("safe_div"),
        F.try_mod(F.col("event_id"), denom).alias("safe_mod"),
        F.try_divide(F.col("value"), denom).isNull().alias("was_poisoned"),
    )
