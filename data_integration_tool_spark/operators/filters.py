"""Filter / projection operators (SURVEY.md §2.2).

All predicates are Column expressions (never Python UDFs) so Catalyst
pushes them into the parquet scan (``PushedFilters``) — at scale this
skips whole row groups via min/max statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "filter_cmp",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_shipdate
        FROM lineitem
        WHERE l_discount > 0.05 AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_quantity >= 10.0
    """,
    phase="P1",
    tags=("filter",),
)
def filter_cmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric + date range predicates, pushed down to the scan."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_discount") > 0.05)
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_quantity") >= 10.0)
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"
    )


@query(
    "filter_in_like",
    oracle="""
        SELECT p_partkey, p_name, p_brand, p_type
        FROM part
        WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
          AND p_type LIKE '%ECO%'
    """,
    phase="P1",
    tags=("filter",),
)
def filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + LIKE pattern predicates."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
        & F.col("p_type").like("%ECO%")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@query(
    "filter_null",
    oracle="""
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS maybe_price
        FROM orders
        WHERE (CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END) IS NOT NULL
    """,
    phase="P1",
    tags=("filter", "null"),
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic null handling (fixtures have no natural nulls,
    so nulls are introduced with a CASE and then filtered)."""
    o = load(spark, sf_dir, "orders")
    maybe = F.when(F.col("o_orderstatus") == "O", F.lit(None).cast("double")).otherwise(
        F.col("o_totalprice")
    )
    return (
        o.withColumn("maybe_price", maybe)
        .filter(F.col("maybe_price").isNotNull())
        .select("o_orderkey", "o_orderstatus", "maybe_price")
    )


@query(
    "project_expr",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
        FROM lineitem
    """,
    phase="P1",
    tags=("project",),
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns — arithmetic stays in whole-stage codegen."""
    li = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charge"),
    )


@query(
    "project_case",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice >= 300000 THEN 'high'
                    WHEN o_totalprice >= 100000 THEN 'mid'
                    ELSE 'low' END AS price_band,
               CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished' ELSE 'other' END AS status_name
        FROM orders
    """,
    phase="P1",
    tags=("project", "case"),
)
def project_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searched CASE + simple CASE conditionals."""
    o = load(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
    )
    status = (
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("other")
    )
    return o.select(
        "o_orderkey", band.alias("price_band"), status.alias("status_name")
    )
