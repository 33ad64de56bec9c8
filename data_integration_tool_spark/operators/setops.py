"""Set operations (SURVEY.md §2.7).

UNION ALL is shuffle-free (pure partition concatenation); the distinct
variants shuffle on the full row hash. EXCEPT/INTERSECT use Spark's
distinct semantics to match ANSI (and DuckDB's) default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


def _big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_mktsegment")


def _builders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_mktsegment"
    )


_ORACLE_A = "SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000"
_ORACLE_B = "SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'"


@query(
    "set_union_all",
    oracle=f"{_ORACLE_A} UNION ALL {_ORACLE_B}",
    phase="P2",
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — keeps duplicates, no shuffle."""
    return _big_spenders(spark, sf_dir).unionAll(_builders(spark, sf_dir))


@query(
    "set_union_distinct",
    oracle=f"{_ORACLE_A} UNION {_ORACLE_B}",
    phase="P2",
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union — dedups across both inputs (one shuffle on row hash)."""
    return _big_spenders(spark, sf_dir).union(_builders(spark, sf_dir)).distinct()


@query(
    "set_intersect",
    oracle=f"{_ORACLE_A} INTERSECT {_ORACLE_B}",
    phase="P2",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows in both slices (distinct semantics, matching ANSI INTERSECT)."""
    return _big_spenders(spark, sf_dir).intersect(_builders(spark, sf_dir))


@query(
    "set_except",
    oracle=f"{_ORACLE_A} EXCEPT {_ORACLE_B}",
    phase="P2",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows in A but not B (distinct semantics, matching ANSI EXCEPT)."""
    return _big_spenders(spark, sf_dir).subtract(_builders(spark, sf_dir))


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem",
    phase="P1",
    tags=("setop", "distinct"),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row dedup — partial map-side distinct before the shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus", "l_shipdate").distinct()


_MULTISET_A = (
    "SELECT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) AS qty "
    "FROM lineitem WHERE year(l_shipdate) = 1996"
)
_MULTISET_B = (
    "SELECT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) AS qty "
    "FROM lineitem WHERE year(l_shipdate) = 1997"
)


def _lineitem_slice(spark: SparkSession, sf_dir: str, yr: int) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.year("l_shipdate") == yr).select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("bigint").alias("qty"),
    )


@query(
    "set_intersect_all",
    oracle=f"{_MULTISET_A} INTERSECT ALL {_MULTISET_B}",
    phase="P2",
    tags=("setop", "multiset"),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection — each row kept min(countA, countB) times
    (ANSI INTERSECT ALL), over two heavily-duplicated lineitem slices
    (flags x statuses x 50 quantities → thousands of copies per row).
    Unlike the distinct variant this preserves multiplicity, which is
    what reconciliation workloads need ("how many of THESE rows appear
    in both feeds"), and Spark plans it as ONE aggregate-style shuffle
    per side on the row hash carrying (row, count) — never a row-by-row
    expansion, so it scales exactly like a groupBy."""
    return _lineitem_slice(spark, sf_dir, 1996).intersectAll(
        _lineitem_slice(spark, sf_dir, 1997)
    )


@query(
    "set_except_all",
    oracle=f"{_MULTISET_A} EXCEPT ALL {_MULTISET_B}",
    phase="P2",
    tags=("setop", "multiset"),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference — each row kept max(countA - countB, 0)
    times (ANSI EXCEPT ALL): the "what's left after cancelling matched
    copies" shape of ledger/feed reconciliation. Same (row, count)
    shuffle plan as set_intersect_all — multiplicity travels as ONE
    counter per distinct row, not as physical duplicates."""
    return _lineitem_slice(spark, sf_dir, 1996).exceptAll(
        _lineitem_slice(spark, sf_dir, 1997)
    )
