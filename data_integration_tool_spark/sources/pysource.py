"""Custom Python Data Source (Spark 4 DataSource API).

The extensibility surface a data-integration tool lives on: when a feed
has no built-in connector (an internal service, a device protocol, a
synthetic generator), Spark 4's Python DataSource API plugs a pure-
Python reader into the normal ``spark.read.format(...)`` pipeline —
with real partition-parallel reads (each ``InputPartition`` is read by
a separate task) and the full Catalyst treatment downstream.

The demo source generates a deterministic "sensor" table from integer
arithmetic only (a Lehmer-style multiplier mod 2^16), so the whole
custom-connector path gets a FULL DuckDB value oracle via ``range()``:
the query below proves rows produced by user Python code flow through
partition-parallel scan → shuffle → aggregate exactly like parquet
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query

N_ROWS = 10_000
N_PARTS = 8
N_SENSORS = 8


def _reading(i: int) -> int:
    """Deterministic pseudo-reading — pure integer arithmetic, shared
    semantically with the oracle SQL (Lehmer multiplier mod 2^16)."""
    return (i * 48271) % 65536


class _SensorReader:
    """Partitioned reader: each partition generates its own id slice —
    Spark schedules one task per partition, so the custom source scans
    in parallel exactly like a multi-file parquet read."""

    def __init__(self, options):
        self.n = int(options.get("n", N_ROWS))
        self.parts = int(options.get("parts", N_PARTS))

    def partitions(self):
        from pyspark.sql.datasource import InputPartition

        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition):
        p = partition.value
        per = (self.n + self.parts - 1) // self.parts
        for i in range(p * per, min((p + 1) * per, self.n)):
            yield (i, i % N_SENSORS, _reading(i))


def _register(spark: SparkSession) -> None:
    from pyspark.sql.datasource import DataSource, DataSourceReader

    class SensorSource(DataSource):
        @classmethod
        def name(cls):
            return "sensorgen"

        def schema(self):
            return "id bigint, sensor bigint, reading bigint"

        def reader(self, schema):
            reader = _SensorReader(self.options)

            class R(DataSourceReader):
                partitions = staticmethod(reader.partitions)
                read = staticmethod(reader.read)

            return R()

    spark.dataSource.register(SensorSource)


@query(
    "source_python_datasource",
    oracle=f"""
        WITH gen AS (
            SELECT CAST(u.i AS BIGINT) AS id,
                   CAST(u.i % {N_SENSORS} AS BIGINT) AS sensor,
                   CAST((u.i * 48271) % 65536 AS BIGINT) AS reading
            FROM unnest(range(0, {N_ROWS})) AS u(i)
        )
        SELECT sensor,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(reading) AS BIGINT) AS sum_reading,
               CAST(min(reading) AS BIGINT) AS min_reading,
               CAST(max(reading) AS BIGINT) AS max_reading
        FROM gen
        GROUP BY sensor
        ORDER BY sensor
    """,
    phase="P4",
    tags=("source", "datasource-api", "connector"),
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom-connector round trip: register the pure-Python
    ``sensorgen`` source (module docstring), read it partition-parallel
    through ``spark.read.format``, aggregate per sensor. The oracle
    regenerates the same integer stream with ``range()`` — value-
    verifying that a user-written Python connector feeds Catalyst
    exactly like a native source. At 100 TB the same API wraps real
    external feeds; throughput then hinges on partitions() exposing
    enough splits, which this reader demonstrates (one id slice per
    InputPartition → one task each).
    """
    _register(spark)
    df = spark.read.format("sensorgen").option("n", N_ROWS).option(
        "parts", N_PARTS
    ).load()
    return (
        df.groupBy("sensor")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("reading").cast("bigint").alias("sum_reading"),
            F.min("reading").cast("bigint").alias("min_reading"),
            F.max("reading").cast("bigint").alias("max_reading"),
        )
        .orderBy("sensor")
    )
