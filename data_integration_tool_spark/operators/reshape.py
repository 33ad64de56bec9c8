"""Reshape operators: wide↔long conversion (pivot's inverse lives here;
pivot itself is in aggregates-adjacent ``pivot`` query).

``unpivot`` is a zero-shuffle narrow transformation — each input row
expands to k output rows on the same partition — so it scales linearly
regardless of data size; the oracle uses the portable UNION ALL form
rather than dialect-specific UNPIVOT syntax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "unpivot_melt",
    oracle="""
        SELECT p_partkey, 'retailprice' AS attr,
               CAST(p_retailprice AS DOUBLE) AS val
        FROM part
        UNION ALL
        SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val
        FROM part
    """,
    phase="P3",
    tags=("reshape", "unpivot"),
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt part's numeric attributes to long form (id, attr, val) —
    the inverse of pivot, via the native unpivot operator (Spark ≥3.4;
    plans as Expand: k rows per input row, no shuffle, no UDF)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    ).unpivot(
        ids=["p_partkey"],
        values=["retailprice", "size"],
        variableColumnName="attr",
        valueColumnName="val",
    )
