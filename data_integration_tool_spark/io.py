"""Table loading over the driver-generated parquet fixtures.

The nine test tables (FIXTURES.md) are plain parquet files; Spark's
vectorized parquet reader ingests their schema as-is. ``load`` returns a
lazy DataFrame — filters and projections applied downstream push down
into the scan (verify with ``df.explain``: ``PushedFilters`` /
``ReadSchema``). At cluster scale the same call reads a partitioned
directory tree; nothing here assumes a single file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale.
DIM_TABLES: frozenset[str] = frozenset({"region", "nation", "supplier"})


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one fixture table from a scale-factor directory.

    events.ts is stored as parquet TIMESTAMP(NANOS), which Spark 4's
    vectorized reader rejects outright (PARQUET_TYPE_ILLEGAL). We read
    it as raw nanos (legacy nanosAsLong) and rebuild a µs timestamp with
    exact integer division — same truncation DuckDB applies when it
    presents TIMESTAMP_NS as TIMESTAMP. Plain ``/`` would round-trip
    through double and lose precision at 2^53 ns (~104 days), so DIV.
    """
    if table not in TABLES:
        raise ValueError(f"unknown table {table!r}; expected one of {TABLES}")
    from .shipping import ship_package

    ship_package(spark)
    if table == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table (lazy — no I/O until an action runs)."""
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for the spark.sql path."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
