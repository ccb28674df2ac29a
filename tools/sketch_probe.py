"""Scale probe for the wave-9 sketch operators: measures, via the UI
REST stage metrics, (a) the shuffle volume of threshold heavy hitters
vs the plain groupBy+HAVING formulation, and (b) the exact-verify join
input of Bloom-prefiltered vs plain decontamination — the two numbers
the sketches exist to shrink. Run at sf0.1:

    SPARK_GRAFT_UI=1 python tools/sketch_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

os.environ.setdefault("SPARK_GRAFT_UI", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from incubator_flink_old_spark import get_spark  # noqa: E402
from incubator_flink_old_spark.operators.sketches import (  # noqa: E402
    decontaminate_bloom,
    heavy_hitters,
)
from incubator_flink_old_spark.operators.text import decontaminate  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("sketch-probe")
    base = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}/stages"
    )
    last = [-1]

    def metrics() -> dict[str, int]:
        stages = json.load(urllib.request.urlopen(base))
        fresh = [
            s
            for s in stages
            if s.get("stageId", -1) > last[0] and s.get("status") != "SKIPPED"
        ]
        if fresh:
            last[0] = max(s["stageId"] for s in fresh)
        return {
            "shuffle_write_records": sum(
                s.get("shuffleWriteRecords", 0) for s in fresh
            ),
            "shuffle_read_records": sum(
                s.get("shuffleReadRecords", 0) for s in fresh
            ),
        }

    # --- heavy hitters: a deterministic long-tail + hot-key stream ------
    # (the fixture's bigram vocabulary is tiny — plain hash-agg combine
    # already collapses it, so the fixture cannot demonstrate the prune;
    # see the operator docstring's WHEN TO USE)
    n = 3_000_000
    stream = spark.range(n).select(
        F.when(F.col("id") % 3 == 0, F.col("id") % 10)
        .otherwise(F.col("id") % 10_000_000 + 100)
        .alias("v")
    )
    plain = (
        stream.groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 1000)
    )
    plain.write.format("noop").mode("overwrite").save()
    m_plain = metrics()
    heavy_hitters(stream, 1000).write.format("noop").mode("overwrite").save()
    m_hh = metrics()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    decontaminate(docs, bench, n=8).write.format("noop").mode("overwrite").save()
    m_exact = metrics()
    decontaminate_bloom(docs, bench, n=8).write.format("noop").mode(
        "overwrite"
    ).save()
    m_bloom = metrics()

    print(
        json.dumps(
            {
                "heavy_hitters": {"plain_groupby": m_plain, "sketched": m_hh},
                "decontaminate": {"exact": m_exact, "bloom": m_bloom},
                "sf_dir": SF_DIR,
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
