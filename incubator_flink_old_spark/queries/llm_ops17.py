"""Training-data pipeline queries, wave 31: engine-side RECURSIVE CTE
execution (Spark 4's WITH RECURSIVE — the same SQL text runs on both
engines, making the oracle a literal shared string) and the Python
UDTF surface (lateral table-valued functions, Spark 4's arrow-batched
row-to-rows form).

The recursive query complements the I1/I2 iterate OPERATORS
(operators/iterations.py): those express iteration in the engine API;
this one hands the loop to Catalyst's UnionLoopExec. Constraints
probed on this build and pinned here: recursion supports UNION ALL
only (no dedup between steps — [UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE])
and a 1M-row accumulation limit — so the recursion below walks a TREE
(each row has exactly one parent), which is naturally bounded:
rows = Σ depth(node) ≈ n·log n, no cycle can exist, and no walk
explosion is possible. Cyclic-graph reachability stays on the iterate
operators, which dedup per round.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import t

_SEQ = itertools.count()

#: THE single source of the recursive rollup — executed verbatim by
#: BOTH engines (Spark temp views over the same parquet the DuckDB
#: views read). Tree node id = c_custkey + 1 (the fixture's keys start
#: at 0, and a 0 node would halve to itself forever without reaching
#: the root); the halving chain id → ⌊id/2⌋ → … → 1 then forms a
#: binary tree over ALL customers. The rollup answers "how many
#: customers, and how much balance, sit in each node's subtree" — the
#: org-hierarchy aggregation every warehouse eventually needs, and the
#: query shape (recursive ancestor expansion + group-by) that flat SQL
#: cannot express. FLOOR(x / 2.0) instead of integer division: Spark
#: and DuckDB disagree on `/` for integers (double vs error-prone
#: int), while float-halving + FLOOR + CAST is bit-identical for every
#: key below 2^52.
RECURSIVE_ROLLUP_SQL = """
    WITH RECURSIVE anc(node, anc) AS (
        SELECT c_custkey AS node, c_custkey + 1 AS anc FROM customer
        UNION ALL
        SELECT a.node, CAST(FLOOR(a.anc / 2.0) AS BIGINT) AS anc
        FROM anc a WHERE a.anc > 1
    )
    SELECT a.anc AS ancestor,
           CAST(COUNT(*) AS BIGINT) AS n_subtree,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
               AS subtree_bal
    FROM anc a JOIN customer c ON a.node = c.c_custkey
    GROUP BY a.anc
    """


@register("q_recursive_rollup", oracle=RECURSIVE_ROLLUP_SQL)
def q_recursive_rollup(spark, sf_dir):
    """Hierarchical subtree rollup via Spark's native WITH RECURSIVE
    (UnionLoopExec) — the oracle IS the query: one SQL string, two
    engines, hash-identical output. See module docstring for the
    probed engine constraints that shape it (UNION ALL only, 1M-row
    accumulation limit → tree-shaped recursion).

    Scale: each recursion step is one equi-join of the frontier
    against nothing (the parent is computed, not joined), so step k
    carries only the nodes of depth ≥ k — the frontier drains
    geometrically; the final group-by is an ordinary hash aggregate.
    At 100 TB-scale hierarchies (billing orgs, category trees) depth
    is log-bounded and the same plan holds."""
    cust = t(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("customer")
    # The tree recursion accumulates Σ depth(node) ≈ n·log2(n) rows,
    # which crosses the build's default 1,000,000-row recursion budget
    # (spark.sql.cteRecursionRowLimit — probed: RECURSION_ROW_LIMIT_
    # EXCEEDED fires at 1M accumulated rows) somewhere around n ≈ 60k
    # customers. Budget the limit from the actual row count (n·(log2+2),
    # floor 1M) and restore the conf after pinning the result eagerly —
    # same conf-hygiene pattern as q_bloom_runtime_join.
    import math

    n = cust.count()
    budget = max(1_000_000, int(n * (math.log2(max(n, 2)) + 2)))
    key = "spark.sql.cteRecursionRowLimit"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(budget))
    try:
        return spark.sql(RECURSIVE_ROLLUP_SQL).localCheckpoint(eager=True)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


_UDTF_CHUNK_ORACLE = r"""
    WITH capped AS (
        SELECT doc_id, coalesce(text, '') AS text
        FROM documents WHERE doc_id % 10 = 0),
    toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS tka
        FROM capped),
    starts AS (
        SELECT doc_id, tka,
               unnest(generate_series(1, greatest(len(tka) - 8, 1), 24)) AS s
        FROM toks)
    SELECT doc_id,
           CAST((s - 1) // 24 AS INT) AS chunk_idx,
           array_to_string(list_slice(tka, s, s + 31), ' ') AS chunk_text,
           len(list_slice(tka, s, s + 31)) AS n_chunk_tokens
    FROM starts
    """


@register("q_udtf_chunks", oracle=_UDTF_CHUNK_ORACLE)
def q_udtf_chunks(spark, sf_dir):
    """Python UDTF (table-valued function, Spark 4) in a LATERAL join —
    the row-to-rows user-code surface, exercised on the established
    chunking semantics (32-token windows, stride 24, tail-covering
    starts — q_text_chunks' rule) over a 1-in-10 doc_id cap.

    This is deliberately the SLOW PATH DEMO: q_text_chunks computes the
    identical result as pure Column expressions (sequence/transform/
    posexplode, JVM-side) and is what a pipeline should ship; the UDTF
    form exists because arbitrary user row-to-rows logic (parsers,
    tokenizers with state, format sniffers) needs this exact plumbing —
    lateral correlation, per-row fan-out, arrow-batched exchange. The
    cap keeps the Python-worker path off the bench's critical path.

    Scale: UDTF evaluation is partition-parallel map-side work (no
    shuffle introduced); cost is the Python boundary itself — which is
    why the Column form wins when expressible."""
    import re as _re

    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "chunk_idx int, chunk_text string, n_chunk_tokens long"
    ))
    class ChunkDoc:
        def eval(self, text: str):
            # NULL text is coalesced to '' on BOTH sides (here via the
            # column fed to the UDTF, in the oracle via coalesce) so the
            # engines agree on the empty-chunk row a NULL doc produces.
            toks = [w for w in _re.split(r"\s+", (text or "").lower()) if w]
            starts = range(0, max(len(toks) - 8, 1), 24)
            for i, s in enumerate(starts):
                window = toks[s : s + 32]
                yield i, " ".join(window), len(window)

    name = f"t2_chunk_udtf_{next(_SEQ)}"
    spark.udtf.register(name, ChunkDoc)
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        # NULL text → '' on the engine side too, matching the oracle's
        # coalesce: a NULL doc produces the same empty-chunk row in both
        # engines instead of diverging (Python guard vs SQL NULL rules).
        .select("doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text"))
    )
    docs.createOrReplaceTempView("t2_udtf_docs")
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_chunk_tokens
        FROM t2_udtf_docs d, LATERAL {name}(d.text) c
        """
    )


_VARIANT_ORACLE = """
    WITH x AS (
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(k AS DECIMAL(27,6))) AS DOUBLE) / COUNT(k) AS avg_k,
           CAST(MAX(k) AS INT) AS max_k,
           CAST(COUNT(CASE WHEN k >= 90 THEN 1 END) AS BIGINT) AS n_high
    FROM x
    GROUP BY 1
    """


@register("q_variant_agg", oracle=_VARIANT_ORACLE)
def q_variant_agg(spark, sf_dir):
    """VARIANT semi-structured aggregation (Spark 4's binary
    semi-structured type): props parses ONCE to a variant column, then
    typed path extraction (try_variant_get) feeds an ordinary hash
    aggregate. Complements q_fn_json's per-access string parsing
    (get_json_object re-parses the JSON text at every path access —
    fine for one field, quadratic in fields): at 100 TB the ingest
    writes the parsed variant (shredded binary, per-field skipping) and
    every downstream access is a direct typed read. The oracle is the
    equivalent JSON-text extraction — results must be identical, only
    the parse topology differs."""
    ev = t(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    x = ev.select("event_type", k.alias("k"))
    return x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.col("k").cast("decimal(27,6)")).cast("double")
            / F.count("k")
        ).alias("avg_k"),
        F.max("k").alias("max_k"),
        F.count(F.when(F.col("k") >= 90, 1)).alias("n_high"),
    )
