"""SparkSession construction with scale-aware defaults.

At test scale (sf0.001–sf0.1, single JVM ``local[N]``) the dominant cost
is per-task scheduling overhead, so shuffle partitions stay small; at
cluster scale the same code runs with the defaults left alone (AQE
coalesces partitions at runtime). Nothing else in the engine depends on
session-level config — every operator is a pure plan builder, so it runs
correctly under whatever session the driver supplies.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data-integration-tool-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores).
    AQE is enabled so partition counts / join strategies / skew handling
    re-plan at runtime — the main lever that lets the same plans run at
    sf0.001 locally and at 100 TB on a real cluster.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # keep stdout clean: the driver json-parses bench.py's final
        # stdout line, and the console progress bar writes \r frames
        # that can interleave with it
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
