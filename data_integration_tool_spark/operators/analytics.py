"""Composite analytics queries — TPC-H-shaped end-to-end workloads.

Single-operator queries prove coverage; these prove the operators
compose the way a real analyst uses them (multi-join + filter + agg +
top-k in one plan) and give the optimizer something worth optimizing:
each runs as one Catalyst plan with pushed filters, broadcast dims,
partial aggregation, and TakeOrderedAndProject at the top.

Date literals are fixed (the generated orders span 1995-2001 — see
FIXTURES.md) so results are deterministic at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "tpch_q3_shipping_priority",
    oracle="""
        SELECT l.l_orderkey,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15'
          AND l.l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
        LIMIT 10
    """,
    phase="P2",
    tags=("analytics", "tpch"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: unshipped orders of one market segment with the
    highest outstanding revenue. Filters reach both scans before the
    joins; the final top-10 plans as TakeOrderedAndProject (l_orderkey
    added to the sort as the deterministic tiebreaker)."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
        SELECT n.n_name,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n.n_name
    """,
    phase="P2",
    tags=("analytics", "tpch"),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (two-year window): revenue where customer and supplier
    share a nation in one region. Six-table join — dims broadcast, the
    two fact tables meet on the shuffled orderkey, and the
    customer/supplier nation equality prunes cross-nation rows at the
    supplier join, not after."""
    r = F.broadcast(
        load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    n = F.broadcast(load(spark, sf_dir, "nation"))
    s = F.broadcast(load(spark, sf_dir, "supplier"))
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
               c.c_acctbal, n.n_name
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    phase="P2",
    tags=("analytics", "tpch"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (one-year window): customers who returned the most
    revenue. The returnflag filter lands in the lineitem scan; nation
    broadcasts; top-20 with c_custkey tiebreaker."""
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, q.total_qty
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN (
            SELECT l_orderkey, sum(l_quantity) AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(l_quantity) > 250
        ) q ON q.l_orderkey = o.o_orderkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
    phase="P2",
    tags=("analytics", "tpch"),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with very large orders. The HAVING
    aggregate reduces lineitem to qualifying orderkeys BEFORE any join
    (semi-join-like pre-reduction — the order/customer joins only see
    the few large orders), then top-100 by price."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    q = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        o.join(q, q.l_orderkey == o.o_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )
