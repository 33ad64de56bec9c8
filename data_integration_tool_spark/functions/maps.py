"""Map functions (SURVEY.md §2.8 fn_map).

The map itself (``map_from_entries`` over sorted entries, ``map_keys``,
``size``, key access) is built and inspected inside the plan; the
driver-visible projection is scalar-only (harness contract: the driver's
pandas canonicalizer cannot hash array/map cells — CORRECTNESS_r05).
Keys render as a sorted comma-joined string and the accessed value as a
micro-unit BIGINT, which also makes the query fully oracle-checkable
(it was rows-only before r6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exprs import MICRO_SQL, micro
from ..io import load
from ..registry import query

_CLICK_AVG = MICRO_SQL.format(
    x="max(CASE WHEN event_type = 'click' THEN avg_value END)"
)


@query(
    "fn_map",
    oracle=f"""
        WITH per_type AS (
            SELECT user_id, event_type, avg(value) AS avg_value
            FROM events
            GROUP BY user_id, event_type
        )
        SELECT user_id,
               string_agg(event_type, ',' ORDER BY event_type) AS types,
               count(*) AS n_types,
               {_CLICK_AVG} AS click_avg_micro
        FROM per_type
        GROUP BY user_id
    """,
    phase="P4",
    tags=("function", "map"),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_map / map_keys / map_values / element access.

    Builds a per-event-type stats map {type: avg_value} per user (one
    grouped aggregation; entries sorted so the map's key order is
    deterministic), then inspects it: key list, cardinality, and the
    'click' entry. Output is scalar-rendered: keys as a sorted CSV
    string, the accessed average as micro-units (floor(x*1e6+0.5), the
    text.py house rule — avg's float summation order differs between
    engines and runs, so a raw double could never hash-match).
    """
    e = load(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(
        F.avg("value").alias("avg_value")
    )
    stats = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "avg_value")))
        ).alias("stats")
    )
    return stats.select(
        "user_id",
        F.array_join(F.map_keys("stats"), ",").alias("types"),
        F.size("stats").cast("bigint").alias("n_types"),
        micro(F.col("stats")["click"]).alias("click_avg_micro"),
    )
