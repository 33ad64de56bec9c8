"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the noop sink (computes every row, writes
nothing) so lazy plans can't cheat, and the first query's session/JVM
warmup is excluded via a separate warmup run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_integration_tool_spark import registry
from data_integration_tool_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    os.environ["SPARK_GRAFT_CPUS"] = CPUS
    # one session, ~90 queries: persist each base table once instead of
    # re-scanning parquet per query (io.load honors this flag)
    os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")
    spark = get_spark(app_name="bench", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    specs = registry.specs()
    # warmup: JVM + parquet footer caches, excluded from timings
    _run(specs["agg_group"].builder(spark, SF_DIR))

    # Shuffle-partition count is a per-workload knob (runtime conf):
    # pair-generating dedup/similarity queries shuffle millions of rows
    # and want full parallelism; everything else at this scale is
    # dominated by task-scheduling overhead and wants few partitions
    # (AQE coalesces further). Measured at sf0.1: light queries ~1.8×
    # faster at 8, dedup_minhash ~1.4× faster at 32.
    heavy = {
        name
        for name, spec in specs.items()
        if {"dedup", "similarity"} & set(spec.tags)
    }

    timings: dict[str, float] = {}
    for name in sorted(specs):
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(CPUS) if name in heavy else "8"
        )
        t0 = time.perf_counter()
        _run(specs[name].builder(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
