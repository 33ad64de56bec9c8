"""Scan operators — full scans and pruned scans (SURVEY.md §2.1).

At 100 TB the scan IS the query cost: both queries here compile to a
single ``FileScan parquet`` with ``ReadSchema`` restricted to the
selected columns (verify via ``explain``), so a 2-column projection
never reads the other nine columns off disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exprs import CENTS_SQL, MICRO_SQL, cents, micro
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


# --- Direct per-format source scans (VERDICT r7 Next #3) -------------
#
# Each query materializes ONE fixture table in its wire format (csv /
# json / orc) in a tempdir, reads it back through the real source
# reader, and aggregates — so the driver's value hash proves the
# format leg end to end (writer → on-disk encoding → reader → types),
# not just via the multi-hop etl_convert_roundtrip. The oracle reads
# the parquet view directly: a lossless leg means the aggregates are
# IDENTICAL, so any dropped row, re-typed column, or precision loss in
# the format reader goes driver-red. Floats survive the text formats
# exactly because Java's Double.toString emits the shortest
# round-tripping decimal; they are micro/cents-quantized AFTER
# read-back (quantize-then-sum: order-free integer sums).


def _scan_roundtrip(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    fmt: str,
    agg_fn,
    schema=None,
    project=None,
) -> DataFrame:
    import shutil
    import tempfile

    from ..sources.etl import read_any, write_any

    src = load(spark, sf_dir, table)
    if project is not None:
        src = src.select(*project)
    work = tempfile.mkdtemp(prefix=f"scan_{fmt}_")
    try:
        write_any(src, f"{work}/{fmt}", fmt)
        back = read_any(spark, f"{work}/{fmt}", fmt, schema=schema)
        # sever lineage from the tempdir before it vanishes
        out = agg_fn(back).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@query(
    "scan_csv",
    oracle=f"""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c_custkey) AS BIGINT) AS key_sum,
               CAST(sum({MICRO_SQL.format(x="c_acctbal")}) AS BIGINT)
                   AS acct_micro
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    phase="P3",
    tags=("scan", "io", "csv"),
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source scan, oracled at value level: customer → csv →
    read-back with an EXPLICIT schema (the production rule: explicit
    schema > inference — inference costs an extra full scan at scale
    and can mistype empty partitions), then a per-segment aggregate
    whose every figure must equal the parquet-direct oracle.

    Plan: the read-back is a FileScan csv with the 4 referenced
    columns in ReadSchema; the aggregate is one partial+final
    hash aggregate — the same shape a 100 TB CSV landing zone scan
    compiles to, where per-file splits parallelize the parse."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    )

    def agg(back: DataFrame) -> DataFrame:
        return (
            back.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("c_custkey").cast("bigint").alias("key_sum"),
                F.sum(micro(F.col("c_acctbal")))
                .cast("bigint")
                .alias("acct_micro"),
            )
            .orderBy("c_mktsegment")
        )

    return _scan_roundtrip(
        spark, sf_dir, "customer", "csv", agg, schema=schema
    )


@query(
    "scan_json",
    oracle=f"""
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
               CAST(sum({CENTS_SQL.format(x="o_totalprice")}) AS BIGINT)
                   AS price_cents,
               CAST(min(o_orderdate) AS DATE) AS d0,
               CAST(max(o_orderdate) AS DATE) AS d1
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    phase="P3",
    tags=("scan", "io", "json"),
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source scan, oracled at value level: orders → json →
    read-back with an explicit schema, then a per-status aggregate.
    o_orderdate ships as DATE on the wire (ISO yyyy-MM-dd — exact;
    the fixture's timestamp[us] values are midnights, and DATE is the
    JSON-native lossless encoding), doubles as shortest-round-trip
    JSON numbers.

    Plan: FileScan json with the explicit schema (no sampling pass),
    one partial+final hash aggregate; JSON-lines splits by newline so
    a 100 TB event dump parses fully parallel."""
    from pyspark.sql.types import (
        DateType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", DateType()),
            StructField("o_orderpriority", StringType()),
        ]
    )

    def agg(back: DataFrame) -> DataFrame:
        return (
            back.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("o_orderkey").cast("bigint").alias("key_sum"),
                F.sum(cents(F.col("o_totalprice")))
                .cast("bigint")
                .alias("price_cents"),
                F.min("o_orderdate").alias("d0"),
                F.max("o_orderdate").alias("d1"),
            )
            .orderBy("o_orderstatus")
        )

    return _scan_roundtrip(
        spark,
        sf_dir,
        "orders",
        "json",
        agg,
        schema=schema,
        project=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        ],
    )


@query(
    "scan_orc",
    oracle=f"""
        SELECT p_brand,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(p_size) AS BIGINT) AS size_sum,
               CAST(sum({MICRO_SQL.format(x="p_retailprice")}) AS BIGINT)
                   AS retail_micro
        FROM part
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    phase="P3",
    tags=("scan", "io", "orc"),
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source scan, oracled at value level: part → orc →
    read-back (ORC files carry their own types — no schema needed),
    then a per-brand aggregate.

    Plan: FileScan orc with column pruning to the 3 referenced
    columns (ORC is columnar: unreferenced columns never leave disk)
    and the same partial+final hash aggregate; ORC stripe statistics
    give the reader min/max pruning exactly like parquet row groups
    at cluster scale."""

    def agg(back: DataFrame) -> DataFrame:
        return (
            back.groupBy("p_brand")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("p_size").cast("bigint").alias("size_sum"),
                F.sum(micro(F.col("p_retailprice")))
                .cast("bigint")
                .alias("retail_micro"),
            )
            .orderBy("p_brand")
        )

    return _scan_roundtrip(spark, sf_dir, "part", "orc", agg)
