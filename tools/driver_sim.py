"""Driver simulation: exercise the __spark_entry__ contract exactly the way
the round driver does — its own vanilla SparkSession (NOT the engine's
factory), entry() smoke at sf0.001, every queries()/oracle_sql() pair
compared via DuckDB at sf0.01 with order-insensitive value hashing.

Usage: python tools/driver_sim.py [sf_dir]
Probe flags:
  TZ_PROBE=1   build the session with a non-UTC session timezone to prove
               the engine's prep_session defense normalizes it.
  SIM_ONLY=a,b run only the named queries (comma-separated substrings).
  SIM_SKIP=a,b skip queries whose name contains any listed substring —
               for chunked sf0.1 sweeps where DuckDB's single-threaded
               pair oracles dominate wall time.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def main() -> int:
    builder = SparkSession.builder.master("local[8]").appName("driver-sim")
    if os.environ.get("TZ_PROBE"):
        builder = builder.config("spark.sql.session.timeZone", "America/New_York")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    print(f"entry(): {len(rows)} rows  first={rows[0] if rows else None}")
    assert len(rows) > 0

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    only = [s for s in os.environ.get("SIM_ONLY", "").split(",") if s]
    skip = [s for s in os.environ.get("SIM_SKIP", "").split(",") if s]
    n_match = n_fail = n_rows_only = 0
    for name in sorted(qs):
        if only and not any(s in name for s in only):
            continue
        if skip and any(s in name for s in skip):
            continue
        df = qs[name](spark, SF_DIR)
        out = df.collect()
        if name not in oracles:
            print(f"  {name}: rows-only, {len(out)} rows")
            n_rows_only += 1
            continue
        cur = con.execute(oracles[name])
        exp_cols = [d[0] for d in cur.description]
        exp = cur.fetchall()
        h_spark = value_hash(df.columns, [tuple(r) for r in out])
        h_duck = value_hash(exp_cols, exp)
        ok = h_spark == h_duck and len(out) == len(exp) and sorted(df.columns) == sorted(exp_cols)
        status = "MATCH" if ok else "MISMATCH"
        if not ok:
            n_fail += 1
            print(
                f"  {name}: {status} rows {len(out)}/{len(exp)} "
                f"cols {sorted(df.columns)}/{sorted(exp_cols)}"
            )
        else:
            n_match += 1
            print(f"  {name}: {status} ({len(out)} rows)")
    print(f"TOTAL: {n_match} match, {n_rows_only} rows-only, {n_fail} mismatch")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
