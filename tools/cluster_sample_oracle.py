"""Sample-scoped sf0.1 oracle for the cluster family (VERDICT r04 item 3).

The full-corpus DuckDB twins of q_dedup_cluster / q_cluster_rep embed a
recursive transitive closure over the sf0.1 pair graph (3.57M pairs) that
a single-box oracle cannot finish (PERF.md documents the 50-minute
attempt). This tool closes the gap honestly: it restricts the PAIR LIST
to a deterministic doc_id range on BOTH engines — the pair list itself
was already proven hash-identical at sf0.1 (PERF.md round-4 sweep), so
what remains unvalidated is exactly the closure + canonical-selection
logic, and that logic runs here over a true sf0.1-density subgraph
(pairs among doc_id < K of the FULL corpus's pair list, not a re-run of
the pipeline on a smaller corpus).

Checks, each hash-compared with the driver's algorithm:
  1. dedup_clusters(docs<K, pairs=restricted)  vs recursive-CTE closure
  2. cluster_representatives(docs<K, pairs=restricted) vs closure + rank

Usage: python tools/cluster_sample_oracle.py [sf_dir] [K]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1000


def _sample_sql(k: int) -> tuple[str, str, str]:
    from incubator_flink_old_spark.queries._util import split_case_sql
    from incubator_flink_old_spark.queries.llm_ops import _minhash_oracle

    pairs_sql = _minhash_oracle(band_size=4).strip()
    base = rf"""
    WITH RECURSIVE pairs_full AS MATERIALIZED ({pairs_sql}),
    pairs AS MATERIALIZED (
        SELECT doc_a, doc_b FROM pairs_full
        WHERE doc_a < {k} AND doc_b < {k}),
    docs AS MATERIALIZED (SELECT * FROM documents WHERE doc_id < {k}),
    sym AS MATERIALIZED (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(id, lbl) AS (
        SELECT src AS id, src AS lbl FROM sym
        UNION
        SELECT s.dst AS id, r.lbl
        FROM reach r JOIN sym s ON r.id = s.src
    ),
    comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id),
    cl AS (
        SELECT d.doc_id, COALESCE(comp.component, d.doc_id) AS cluster_id
        FROM docs d LEFT JOIN comp ON d.doc_id = comp.id)"""
    cluster_sql = (
        base
        + """
    SELECT doc_id, cluster_id, doc_id = cluster_id AS keep FROM cl
    """
    )
    rep_sql = (
        base
        + r""",
    toks AS (
        SELECT doc_id,
               list_distinct(list_filter(
                   string_split_regex(lower(text), '\s+'), x -> x <> ''
               )) AS tk,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS tka
        FROM docs),
    qual AS (
        SELECT d.doc_id,
               0.5 * (CAST(len(list_filter(t.tka,
                   x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
                   / len(t.tka))
                 + 0.3 * (1.0 - (1.0 - CAST(len(t.tk) AS DOUBLE) / len(t.tka)))
                 + 0.2 * CAST(LENGTH(d.text) BETWEEN 100 AND 20000 AS DOUBLE)
                   AS quality
        FROM docs d JOIN toks t USING (doc_id)),
    r AS (
        SELECT cl.doc_id, cl.cluster_id, q.quality,
               ROW_NUMBER() OVER (
                   PARTITION BY cl.cluster_id
                   ORDER BY q.quality DESC NULLS LAST, cl.doc_id
               ) AS rn
        FROM cl JOIN qual q USING (doc_id))
    SELECT doc_id, cluster_id, quality, rn = 1 AS is_rep
    FROM r
    """
    )
    split_sql = (
        base
        + f"""
    SELECT doc_id, cluster_id, {split_case_sql("cluster_id")} AS split
    FROM cl
    """
    )
    return cluster_sql, rep_sql, split_sql


def main() -> int:
    from driver_sim import value_hash

    from incubator_flink_old_spark.operators.text import (
        cluster_representatives,
        dedup_clusters,
        minhash_lsh_pairs,
    )
    from incubator_flink_old_spark.queries._util import split_col as _split_col
    from incubator_flink_old_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("cluster-sample-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sample = docs.filter(F.col("doc_id") < K)
    pairs = minhash_lsh_pairs(docs, band_size=4).filter(
        (F.col("doc_a") < K) & (F.col("doc_b") < K)
    )
    # Pin the restricted pair list once; both consumers reuse it.
    pairs = pairs.localCheckpoint(eager=True)
    n_pairs = pairs.count()
    print(f"{SF_DIR} K={K}: {n_pairs} restricted pairs", flush=True)

    spark_sides = {
        "dedup_cluster_sample": dedup_clusters(sample, pairs=pairs, band_size=4),
        # quality stays UNROUNDED on both sides — the registered
        # q_cluster_rep pair matches on raw doubles (identical operand
        # order on both engines), and round() itself is the cross-engine
        # hazard at half-way mantissas (q_embed_cov_profile note).
        "cluster_rep_sample": cluster_representatives(
            sample, pairs=pairs, band_size=4
        ),
        # q_cluster_safe_split's closure + split-law composition over the
        # same restricted subgraph (the split law itself is engine-proven
        # in q_dataset_split; what this adds is split-keyed-by-closure).
        "cluster_safe_split_sample": dedup_clusters(
            sample, pairs=pairs, band_size=4
        ).select(
            "doc_id",
            "cluster_id",
            _split_col("cluster_id").alias("split"),
        ),
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    cluster_sql, rep_sql, split_sql = _sample_sql(K)
    oracle_sides = {
        "dedup_cluster_sample": cluster_sql,
        "cluster_rep_sample": rep_sql,
        "cluster_safe_split_sample": split_sql,
    }

    rc = 0
    for name, sdf in spark_sides.items():
        t0 = time.time()
        srows = sdf.collect()
        scols = sdf.columns
        t1 = time.time()
        res = con.execute(oracle_sides[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        t2 = time.time()
        sh = value_hash(scols, srows)
        oh = value_hash(ocols, [tuple(r) for r in orows])
        ok = (
            len(srows) == len(orows)
            and sorted(scols) == sorted(ocols)
            and sh == oh
        )
        print(
            f"  {name}: {'MATCH' if ok else 'MISMATCH'} "
            f"(spark {len(srows)} rows {t1 - t0:.1f}s, "
            f"duckdb {len(orows)} rows {t2 - t1:.1f}s)",
            flush=True,
        )
        if not ok:
            rc = 1
            print(f"    spark cols={scols} hash={sh[:16]}")
            print(f"    duck  cols={ocols} hash={oh[:16]}")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
