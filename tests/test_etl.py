"""ETL format-conversion round-trips (SURVEY.md §2.1): parquet → csv /
json / orc → parquet must preserve row counts and values; mapping specs
must apply; partitioned writes must produce prunable layouts."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_integration_tool_spark.io import load
from data_integration_tool_spark.sources import etl


@pytest.fixture()
def tmpdir():
    with tempfile.TemporaryDirectory() as d:
        yield d


NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_roundtrip(spark, sf_dir, tmpdir, fmt):
    src = load(spark, sf_dir, "nation")
    mid = os.path.join(tmpdir, f"nation_{fmt}")
    back = os.path.join(tmpdir, "nation_back")
    etl.convert(spark, f"{sf_dir}/nation.parquet", "parquet", mid, fmt)
    # csv/json are schemaless → supply the schema on the way back
    schema = NATION_SCHEMA if fmt in ("csv", "json") else None
    etl.convert(spark, mid, fmt, back, "parquet", schema=schema)
    got = spark.read.parquet(back)
    assert got.count() == src.count()
    assert sorted(r.n_name for r in got.collect()) == sorted(
        r.n_name for r in src.collect()
    )


def test_mapping_applies(spark, sf_dir, tmpdir):
    dst = os.path.join(tmpdir, "mapped")
    etl.convert(
        spark,
        f"{sf_dir}/lineitem.parquet",
        "parquet",
        dst,
        "parquet",
        mapping={
            "order_key": "l_orderkey",
            "revenue": "l_extendedprice * (1 - l_discount)",
            "ship_year": "year(l_shipdate)",
        },
    )
    got = spark.read.parquet(dst)
    assert got.columns == ["order_key", "revenue", "ship_year"]
    src = load(spark, sf_dir, "lineitem")
    expect = src.agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    ).first()[0]
    assert abs(got.agg(F.sum("revenue")).first()[0] - expect) < 1e-6


def test_partitioned_write_prunes(spark, sf_dir, tmpdir):
    dst = os.path.join(tmpdir, "by_status")
    etl.convert(
        spark,
        f"{sf_dir}/orders.parquet",
        "parquet",
        dst,
        "parquet",
        partition_by=["o_orderstatus"],
    )
    # hive layout on disk
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(dst))
    # partition filter prunes to one directory (visible in the plan)
    df = spark.read.parquet(dst).filter(F.col("o_orderstatus") == "F")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    src_f = (
        load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").count()
    )
    assert df.count() == src_f


def test_bad_format_rejected(spark, tmpdir):
    with pytest.raises(ValueError, match="unsupported"):
        etl.read_any(spark, tmpdir, "xml")
    with pytest.raises(ValueError, match="unsupported"):
        etl.write_any(spark.range(1), tmpdir, "avro")
