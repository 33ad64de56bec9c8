"""Map functions (SURVEY.md §2.8, P4 — rows-only: map literals render
engine-specifically, so the driver's weaker check applies; pytest
asserts the values)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "fn_map",
    oracle=None,  # map rendering is engine-specific → rows-only + pytest
    phase="P4",
    tags=("function", "map"),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_map / map_keys / map_values / element access.

    Builds a per-event-type stats map {type: avg_value} per user, then
    inspects it — the build side is one grouped aggregation.
    """
    e = load(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(
        F.avg("value").alias("avg_value")
    )
    return (
        per_type.groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.struct("event_type", "avg_value"))
                )
            ).alias("stats")
        )
        .select(
            "user_id",
            F.map_keys("stats").alias("types"),
            F.size("stats").alias("n_types"),
            F.col("stats")["click"].alias("click_avg"),
        )
    )
