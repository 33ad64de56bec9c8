"""Ship this package to Spark's Python workers.

Closures sent to Python workers (pandas UDFs, mapInPandas) may reference
module-level functions, which cloudpickle serializes BY REFERENCE — the
worker then needs to ``import data_integration_tool_spark`` itself. The
driver process may have imported us from a path workers don't have
(sys.path edits don't propagate), so the package zips itself and rides
``SparkContext.addPyFile``, which distributes to every worker and
prepends to their sys.path. Idempotent per SparkContext; a no-op for
pure-JVM queries beyond one set lookup.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_shipped: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _shipped:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"data_integration_tool_spark_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    sc.addPyFile(zpath)
    _shipped.add(key)
