"""Date/time function family (SURVEY.md §2.8 fn_date).

DuckDB/Spark parity traps handled here (SURVEY.md §7 hard-part d):
- datediff: Spark is (end, start) in days; DuckDB is date_diff('day',
  start, end) — note the flipped argument order.
- day-of-week numbering: Spark ``dayofweek`` is 1=Sunday; DuckDB's
  ``isodow`` is 1=Monday..7=Sunday, which equals Spark ``weekday()+1``.
- events.ts is stored as timestamp[ns]; Spark truncates to µs on read,
  so the oracle casts to plain (µs) TIMESTAMP explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "fn_date",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate)                          AS order_year,
               month(o_orderdate)                         AS order_month,
               day(o_orderdate)                           AS order_day,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                                                          AS order_month_start,
               CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP)
                                                          AS order_quarter_start,
               date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
               CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
               CAST(last_day(o_orderdate) AS TIMESTAMP)   AS month_end,
               isodow(o_orderdate)                        AS iso_weekday,
               CAST(epoch(o_orderdate) AS BIGINT)         AS unix_sec
        FROM orders
    """,
    phase="P2",
    tags=("function", "date"),
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/date_trunc/datediff/date_add/last_day/weekday/epoch."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.date_trunc("quarter", "o_orderdate").alias("order_quarter_start"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since_epoch_start"),
        # date_add/last_day return DATE; cast to TIMESTAMP so both engines
        # ship the same logical type (this DuckDB's date_trunc('month', ts)
        # and last_day return DATE, Spark's date_trunc returns TIMESTAMP —
        # mixed DATE-vs-TIMESTAMP columns are exactly what the driver's
        # exact value-hash cannot tolerate).
        F.date_add(F.col("o_orderdate"), 30).cast("timestamp").alias("due_date"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        (F.weekday("o_orderdate") + 1).alias("iso_weekday"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
    )


@query(
    "fn_date_bucket",
    oracle="""
        SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS event_day,
               event_type,
               count(*)   AS n_events,
               sum(value) AS total_value
        FROM events
        GROUP BY date_trunc('day', CAST(ts AS TIMESTAMP)), event_type
    """,
    phase="P2",
    tags=("function", "date", "agg"),
)
def fn_date_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-day bucketing of the event stream — the batch form of a
    daily tumbling window."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("day", "ts").alias("event_day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
