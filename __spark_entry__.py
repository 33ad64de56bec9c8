"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``data_integration_tool_spark``; this module
only adapts the package's registry to the driver's API.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Python UDF workers inherit the JVM's environment, and the JVM inherits
# ours — this module is imported before the driver creates its
# SparkSession, so setting it here silences pyspark's own pandas-concat
# FutureWarning spew (serializers.py) from every applyInPandas worker in
# the driver's stderr. Deprecation noise only; never alters behavior.
os.environ.setdefault("PYTHONWARNINGS", "ignore::FutureWarning")

from data_integration_tool_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001.

    Looked up via the registry (not an eager module import) so the
    dict order of ``queries()`` is exactly ``registry._DRIVER_PRIORITY``
    — the round-1 driver only recorded the first 50 entries.
    """
    return registry.queries()["agg_group"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twin SQL for every SQL-expressible query in ``queries()``."""
    return registry.oracles()
