"""ETL format-conversion layer (SURVEY.md §2.1) — the reference's core
job ("formatting data from one complex system to another",
BASELINE.json:5-7), re-expressed as declarative Spark I/O.

``convert`` is read → mapping → write where the mapping is a dict of
output column → SQL expression string, compiled to Column expressions so
Catalyst folds them into the scan (projection pushdown). Nothing is
materialized on the driver; a 100 TB conversion is the same code with a
partitioned destination.

Supported formats: parquet, csv, json, orc (Spark native readers —
schema inference optional for csv/json, explicit schema preferred).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

FORMATS = ("parquet", "csv", "json", "orc")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` in ``fmt``. CSV defaults to header+non-inferred
    strings unless a schema is given (explicit schema > inference:
    inference is an extra full scan at scale)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported source format {fmt!r}; one of {FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        opts = {"header": "true", **options}
        if schema is None and "inferSchema" not in opts:
            opts["inferSchema"] = "true"
        return reader.options(**opts).csv(path)
    if fmt == "json":
        return reader.options(**options).json(path)
    if fmt == "orc":
        return reader.options(**options).orc(path)
    return reader.options(**options).parquet(path)


def write_any(
    df: DataFrame,
    path: str,
    fmt: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write ``df`` to ``path`` in ``fmt``. ``partition_by`` produces a
    hive-partitioned directory tree (the scale-out layout: downstream
    readers get partition pruning for free)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported sink format {fmt!r}; one of {FORMATS}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.options(header="true", **options).csv(path)
    elif fmt == "json":
        writer.options(**options).json(path)
    elif fmt == "orc":
        writer.options(**options).orc(path)
    else:
        writer.options(**options).parquet(path)


def apply_mapping(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Project ``df`` through a mapping of output column → SQL expression
    (e.g. ``{"revenue": "price * (1 - discount)", "day": "date_trunc('day', ts)"}``).
    Expressions are parsed by Catalyst — they push down and codegen like
    hand-written DataFrame code."""
    return df.select(*[F.expr(expr).alias(name) for name, expr in mapping.items()])


def convert(
    spark: SparkSession,
    src_path: str,
    src_fmt: str,
    dst_path: str,
    dst_fmt: str,
    mapping: dict[str, str] | None = None,
    schema: StructType | None = None,
    partition_by: list[str] | None = None,
    read_options: dict[str, str] | None = None,
    write_options: dict[str, str] | None = None,
) -> None:
    """One-shot format conversion: read src → optional column mapping →
    write dst. The whole pipeline is one Spark job; no driver round-trip.
    """
    df = read_any(spark, src_path, src_fmt, schema=schema, **(read_options or {}))
    if mapping:
        df = apply_mapping(df, mapping)
    write_any(df, dst_path, dst_fmt, partition_by=partition_by, **(write_options or {}))
