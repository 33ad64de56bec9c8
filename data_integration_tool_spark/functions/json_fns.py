"""JSON function family over events.props (SURVEY.md §2.8 fn_json).

``props`` holds JSON objects like ``{"k": 87}``. Extraction stays
JVM-side (``get_json_object`` / ``from_json``); results are cast to
concrete types so the DuckDB twin (``->>`` extraction + cast) matches
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load
from ..registry import query


@query(
    "fn_json",
    oracle="""
        SELECT event_id,
               CAST(props->>'$.k' AS BIGINT)  AS k_value,
               CAST(props->>'$.k' AS BIGINT) % 10 AS k_mod10,
               (props->>'$.missing') IS NULL  AS missing_is_null
        FROM events
    """,
    phase="P2",
    tags=("function", "json"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object extraction with typed casts + missing-path null."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.select(
        "event_id",
        k.alias("k_value"),
        (k % 10).alias("k_mod10"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
    )


@query(
    "fn_json_agg",
    oracle="""
        SELECT event_type,
               avg(CAST(props->>'$.k' AS BIGINT)) AS avg_k,
               count(*) AS n
        FROM events
        WHERE CAST(props->>'$.k' AS BIGINT) > 50
        GROUP BY event_type
    """,
    phase="P2",
    tags=("function", "json", "agg"),
)
def fn_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema, filtered + aggregated."""
    e = load(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    k = F.from_json("props", schema).getField("k")
    return (
        e.withColumn("k", k)
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(F.avg("k").alias("avg_k"), F.count(F.lit(1)).alias("n"))
    )
