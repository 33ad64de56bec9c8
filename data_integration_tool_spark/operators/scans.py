"""Scan operators — full scans and pruned scans (SURVEY.md §2.1).

At 100 TB the scan IS the query cost: both queries here compile to a
single ``FileScan parquet`` with ``ReadSchema`` restricted to the
selected columns (verify via ``explain``), so a 2-column projection
never reads the other nine columns off disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load
from ..registry import query


@query(
    "scan_parquet",
    oracle="SELECT * FROM region",
    phase="P1",
    tags=("scan",),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of a (small) table, schema as stored."""
    return load(spark, sf_dir, "region")


@query(
    "scan_projected",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
    phase="P1",
    tags=("scan", "pruning"),
)
def scan_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan — ReadSchema must contain exactly these two."""
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
