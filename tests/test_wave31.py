"""Wave-31 surfaces: the engine constraints q_recursive_rollup's design
rests on (tripwires — if a Spark upgrade lifts them, the docstrings and
the tree-only recursion rule need revisiting), UDTF lateral plumbing,
and variant extraction typing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_recursive_cte_union_still_unsupported(spark):
    """q_recursive_rollup uses UNION ALL because this build rejects
    recursive UNION ([UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE]). If this
    test starts failing, Spark gained recursive dedup — cyclic-graph
    recursion becomes expressible and the wave-31 docstrings are
    stale."""
    with pytest.raises(AnalysisException, match="UNION"):
        spark.sql(
            """
            WITH RECURSIVE r(n) AS (
                SELECT 1 AS n
                UNION
                SELECT n + 1 FROM r WHERE n < 3
            )
            SELECT * FROM r
            """
        ).collect()


def test_recursive_cte_row_limit_guard(spark):
    """The recursion budget exists (level limit 100 / row limit via
    spark.sql.cteRecursionRowLimit — and is why tree-shaped recursion
    is the rule): an unbounded-walk recursion must raise rather than
    run away."""
    with pytest.raises(Exception, match="RECURSION|LIMIT"):
        spark.sql(
            """
            WITH RECURSIVE r(n) AS (
                SELECT 1 AS n
                UNION ALL
                SELECT n FROM r
            )
            SELECT COUNT(*) FROM r
            """
        ).collect()


@pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")
def test_recursive_rollup_root_covers_everything(spark):
    """The rollup's root (ancestor 1) must count every customer, and
    each node's subtree count must equal 1 + its children's counts
    (spot-checked on the two children of the root)."""
    from incubator_flink_old_spark.queries.llm_ops17 import (
        q_recursive_rollup,
    )
    from incubator_flink_old_spark.sources import load_table

    out = {r.ancestor: r.n_subtree for r in q_recursive_rollup(spark, SF).collect()}
    cust = load_table(spark, SF, "customer")
    n = cust.count()
    assert out[1] == n
    # tree id = custkey + 1, so the root node itself is custkey 0
    own = cust.filter(F.col("c_custkey") == 0).count()
    assert out[1] == own + out.get(2, 0) + out.get(3, 0)


@pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")
def test_udtf_chunks_match_column_form(spark):
    """The UDTF chunker must agree with the Column-expression chunker
    (operators/text.chunk_documents) row-for-row on the capped doc set
    — same rule, two execution paths."""
    from incubator_flink_old_spark.operators.text import chunk_documents
    from incubator_flink_old_spark.queries.llm_ops17 import q_udtf_chunks
    from incubator_flink_old_spark.sources import load_table

    udtf_rows = {
        (r.doc_id, r.chunk_idx, r.chunk_text, r.n_chunk_tokens)
        for r in q_udtf_chunks(spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") % 10 == 0)
    col_rows = {
        (r.doc_id, r.chunk_idx, r.chunk_text, r.n_chunk_tokens)
        for r in chunk_documents(docs, chunk_tokens=32, overlap=8).collect()
    }
    assert udtf_rows == col_rows and len(udtf_rows) > 0


@pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")
def test_variant_get_type_and_nulls(spark):
    """try_variant_get must produce a typed INT column (no string
    round-trip downstream) and tolerate malformed JSON as NULL rather
    than failing the scan."""
    from incubator_flink_old_spark.sources import local_rows

    df = local_rows(
        spark,
        [(1, '{"k": 7}'), (2, "not json"), (3, None), (4, '{"j": 1}')],
        "id long, props string",
    )
    v = F.try_parse_json("props")
    out = df.select(
        "id", F.try_variant_get(v, "$.k", "int").alias("k")
    ).collect()
    got = {r.id: r.k for r in out}
    assert got == {1: 7, 2: None, 3: None, 4: None}
    [field] = [f for f in df.select(
        F.try_variant_get(v, "$.k", "int").alias("k")
    ).schema.fields]
    assert field.dataType.simpleString() == "int"


def test_recursive_rollup_budget_survives_large_n(spark):
    """The rollup's row budget (n·(log2(n)+2), q_recursive_rollup) must
    carry the recursion past the build's 1M default accumulation cap:
    n = 200k halving chains accumulate ~3.6M rows, which FAILS under
    the default conf and must succeed under the budget."""
    import math

    key = "spark.sql.cteRecursionRowLimit"
    sql = """
        WITH RECURSIVE anc(node, anc) AS (
            SELECT id AS node, id + 1 AS anc FROM range(200000)
            UNION ALL
            SELECT a.node, CAST(FLOOR(a.anc / 2.0) AS BIGINT) AS anc
            FROM anc a WHERE a.anc > 1
        )
        SELECT COUNT(*) AS c FROM anc
    """
    n = 200_000
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(int(n * (math.log2(n) + 2))))
    try:
        out = spark.sql(sql).collect()[0].c
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert out > 1_000_000  # genuinely past the default cap
