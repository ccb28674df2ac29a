"""Head-to-head of frozen-center assignment strategies on the sf0.1
embeddings (guide §1: measure before rewriting) — built when the
round-12 trainer refactor initially read as a large ANN-family CPU
regression; the probe's verdict (quiet box, 3 reps): the FOLD forms
carry 3.5x LESS executor CPU than the join/window forms (3.5 vs
12.4/15.0 engine-s), and litfold's wall overhead vs rowfold is NOT
Catalyst planning but PY4J EXPRESSION CONSTRUCTION — per-element
F.lit() calls cost ~2.4 s at 8 cells x 64 dims where one F.expr parse
costs 4 ms (the fix shipped as _sql_bigint_array/_centers_sql_array/
_books_sql_array in operators/similarity.py). The original ~20x CPU
reading came from a contended box-hour plus the committed
_spread_narrow at the trainer entry; see OPTIMIZATION_r12.md.

Strategies over the same quantized frame e(__c, __k):
  window   crossJoin(broadcast(centers_frame)) + ROW_NUMBER window
  maxby    crossJoin(broadcast(centers_frame)) + groupBy(__c).agg(max_by)
  litfold  literal array embedded in expressions + aggregate() fold
  rowfold  1-row broadcast frame carrying array<struct> + aggregate() fold
  litfold_staged  litfold + pre-staged query norms / literal center norms
  unrolled per-center codegen columns + greatest() + CASE first-max pick

Each strategy runs the assignment REPS times to a noop sink; wall via
perf_counter, engine CPU from the UI REST API per strategy.

Usage: python tools/assign_strategy_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main():
    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from incubator_flink_old_spark import get_spark
    from incubator_flink_old_spark.operators.similarity import (
        as_double_array,
        cosine_safe,
    )

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib

    bench = importlib.import_module("bench")  # reuse StageMetrics
    spark = get_spark("assign-strategy-probe")
    metrics = bench.StageMetrics(spark)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    grid = 1_000_000.0
    e = emb.select(
        F.col("vec_id").alias("__c"),
        F.transform(
            as_double_array("embedding"),
            lambda x: F.floor(x * F.lit(grid)).cast("long"),
        ).alias("__k"),
    ).repartition(32).localCheckpoint(eager=True)

    # a fixture centers set: first 8 vectors
    rows = e.orderBy("__c").limit(8).collect()
    centers_rows = [
        {"cell": i + 1, "cv": [int(v) for v in r["__k"]]}
        for i, r in enumerate(rows)
    ]
    centers_frame = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r["cell"]).cast("int").alias("cell"),
                        F.array(
                            *[F.lit(v).cast("long") for v in r["cv"]]
                        ).alias("cv"),
                    )
                    for r in centers_rows
                ]
            )
        ).alias("s")
    ).select("s.cell", "s.cv").localCheckpoint(eager=True)
    one_row_arr = spark.range(1).select(
        F.array(
            *[
                F.struct(
                    F.lit(r["cell"]).cast("int").alias("cell"),
                    F.array(*[F.lit(v).cast("long") for v in r["cv"]]).alias(
                        "cv"
                    ),
                )
                for r in centers_rows
            ]
        ).alias("carr")
    ).localCheckpoint(eager=True)

    def window_form():
        j = e.crossJoin(F.broadcast(centers_frame)).select(
            "__c", "__k", "cell",
            cosine_safe(as_double_array("__k"), as_double_array("cv")).alias("__sim"),
        )
        return (
            j.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("__c").orderBy(F.col("__sim").desc(), "cell")
                ),
            )
            .filter(F.col("__rn") == 1)
            .select("__c", "__k", "cell")
        )

    def maxby_form():
        j = e.crossJoin(F.broadcast(centers_frame)).select(
            "__c", "__k", "cell",
            cosine_safe(as_double_array("__k"), as_double_array("cv")).alias("__sim"),
        )
        return (
            j.groupBy("__c")
            .agg(
                F.max_by(
                    F.struct("cell", "__k"),
                    F.struct(F.col("__sim"), (-F.col("cell")).alias("nc")),
                ).alias("b")
            )
            .select("__c", F.col("b.__k").alias("__k"), F.col("b.cell").alias("cell"))
        )

    def litfold_form():
        arr = F.array(
            *[
                F.struct(
                    F.lit(r["cell"]).alias("cell"),
                    F.array(*[F.lit(v).cast("long") for v in r["cv"]]).alias("cv"),
                )
                for r in centers_rows
            ]
        )
        sims = F.transform(
            arr,
            lambda ctr: F.struct(
                ctr.getField("cell").alias("c"),
                cosine_safe(
                    as_double_array("__k"), as_double_array(ctr.getField("cv"))
                ).alias("s"),
            ),
        )
        best = F.aggregate(
            sims,
            F.struct(F.lit(-1).alias("c"), F.lit(-3.0).alias("s")),
            lambda acc, x: F.when(x.getField("s") > acc.getField("s"), x).otherwise(acc),
        )
        return e.select("__c", "__k", best.getField("c").cast("int").alias("cell"))

    def rowfold_form():
        sims = F.transform(
            F.col("carr"),
            lambda ctr: F.struct(
                ctr.getField("cell").alias("c"),
                cosine_safe(
                    as_double_array("__k"), as_double_array(ctr.getField("cv"))
                ).alias("s"),
            ),
        )
        best = F.aggregate(
            sims,
            F.struct(F.lit(-1).alias("c"), F.lit(-3.0).alias("s")),
            lambda acc, x: F.when(x.getField("s") > acc.getField("s"), x).otherwise(acc),
        )
        return (
            e.crossJoin(F.broadcast(one_row_arr))
            .select("__c", "__k", best.getField("c").cast("int").alias("cell"))
        )

    def litfold_staged_form():
        # Stage the query-side double array + its squared norm ONCE per
        # row (the raw fold recomputes both per CENTER per row), and
        # bake each center's double array AND squared norm as literals
        # computed driver-side in exact integer arithmetic (every term
        # < 2^53, so float() is the same IEEE double the JVM aggregate
        # produces). Per (row, center) only the dot product remains.
        def nb2_lit(cv):
            s = sum(v * v for v in cv)
            assert s < 2**53, "center norm exceeds exact-double range"
            return float(s)

        arr = F.array(
            *[
                F.struct(
                    F.lit(r["cell"]).alias("cell"),
                    F.array(
                        *[F.lit(float(v)).cast("double") for v in r["cv"]]
                    ).alias("cvd"),
                    F.lit(nb2_lit(r["cv"])).alias("nb2"),
                )
                for r in centers_rows
            ]
        )
        staged = e.select(
            "__c",
            "__k",
            as_double_array("__k").alias("__kd"),
        ).select(
            "__c",
            "__k",
            "__kd",
            F.aggregate(
                "__kd", F.lit(0.0), lambda acc, x: acc + x * x
            ).alias("__na2"),
        )
        sims = F.transform(
            arr,
            lambda ctr: F.struct(
                ctr.getField("cell").alias("c"),
                F.when(
                    (F.col("__na2") == F.lit(0.0))
                    | (ctr.getField("nb2") == F.lit(0.0)),
                    F.lit(-2.0),
                )
                .otherwise(
                    F.aggregate(
                        F.zip_with(
                            F.col("__kd"),
                            ctr.getField("cvd"),
                            lambda x, y: x * y,
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    / (F.sqrt(F.col("__na2")) * F.sqrt(ctr.getField("nb2")))
                )
                .alias("s"),
            ),
        )
        best = F.aggregate(
            sims,
            F.struct(F.lit(-1).alias("c"), F.lit(-3.0).alias("s")),
            lambda acc, x: F.when(x.getField("s") > acc.getField("s"), x).otherwise(acc),
        )
        return staged.select(
            "__c", "__k", best.getField("c").cast("int").alias("cell")
        )

    def unrolled_form():
        # One codegen'd scalar expression PER CENTER (no HOF over the
        # center axis): cosine_k columns, then the first-max pick via
        # greatest() + CASE — first match on ascending cell = lowest
        # cell on ties, the ROW_NUMBER (sim desc, cell asc) pick.
        def nb2_lit(cv):
            s = sum(v * v for v in cv)
            assert s < 2**53
            return float(s)

        staged = e.select(
            "__c",
            "__k",
            as_double_array("__k").alias("__kd"),
        ).select(
            "__c",
            "__k",
            "__kd",
            F.aggregate(
                "__kd", F.lit(0.0), lambda acc, x: acc + x * x
            ).alias("__na2"),
        )
        sim_cols = []
        for r in sorted(centers_rows, key=lambda r: r["cell"]):
            cvd = F.array(*[F.lit(float(v)).cast("double") for v in r["cv"]])
            nb2 = nb2_lit(r["cv"])
            sim = F.when(
                (F.col("__na2") == F.lit(0.0)) | (F.lit(nb2) == F.lit(0.0)),
                F.lit(-2.0),
            ).otherwise(
                F.aggregate(
                    F.zip_with(F.col("__kd"), cvd, lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / (F.sqrt(F.col("__na2")) * F.sqrt(F.lit(nb2)))
            )
            sim_cols.append((r["cell"], sim.alias(f"__s{r['cell']}")))
        staged2 = staged.select("__c", "__k", *[s for _, s in sim_cols])
        best = F.greatest(*[F.col(f"__s{c}") for c, _ in sim_cols])
        expr = None
        for c, _ in sim_cols:  # ascending cell: first max = lowest cell
            cond = F.col(f"__s{c}") == best
            expr = F.when(cond, F.lit(c)) if expr is None else expr.when(cond, F.lit(c))
        return staged2.select("__c", "__k", expr.cast("int").alias("cell"))

    forms = {
        "window": window_form,
        "maxby": maxby_form,
        "litfold": litfold_form,
        "rowfold": rowfold_form,
        "litfold_staged": litfold_staged_form,
        "unrolled": unrolled_form,
    }
    # verify identical results first
    ref = None
    for name, f in forms.items():
        got = sorted((r["__c"], r["cell"]) for r in f().collect())
        if ref is None:
            ref = got
        assert got == ref, f"{name} diverges from window form"
    print(f"all {len(forms)} strategies agree on {len(ref)} assignments")
    metrics.advance()
    for name, f in forms.items():
        t0 = time.perf_counter()
        for _ in range(REPS):
            f().write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        m = metrics.advance()
        print(
            f"{name:8s} wall {wall:6.2f}s  ert {m['executor_run_time_ms']/1e3:7.2f}s"
            f"  cpu {m['executor_cpu_time_ns']/1e9:7.2f}s  stages {m['n_stages']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
