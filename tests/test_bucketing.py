"""Bucketed (co-located) joins — the 100 TB pattern for repeated
fact⋈fact joins: both tables pre-hashed into the same bucket layout on
the join key, so the join plans WITHOUT a shuffle exchange on either
side (SCALE.md §3). This suite proves the engine produces genuinely
bucket-pruned plans, not just that the API exists.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_tool_spark.io import load

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    """Write orders + per-order lineitem aggregate as bucketed tables
    on the join key, same bucket count — the co-location contract."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_linesum")
    load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).write.bucketBy(N_BUCKETS, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_orders")
    load(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("qty"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    ).write.bucketBy(N_BUCKETS, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_linesum")
    yield "b_orders", "b_linesum"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_linesum")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Joining two same-bucketed tables on the bucket key must not
    shuffle either side: the physical plan contains a SortMergeJoin
    with ZERO Exchange operators (bucket layout IS the partitioning)."""
    bo, bl = bucketed_tables
    # disable AQE-driven broadcast demotion for a deterministic plan and
    # autoBroadcast so the small test tables don't sidestep the SMJ path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(bo)
            .join(spark.table(bl), F.col("o_orderkey") == F.col("l_orderkey"))
            .select("o_orderkey", "o_totalprice", "qty", "rev")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange" not in plan, plan[:2000]
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan[:2000]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_shuffled_join(spark, sf_dir, bucketed_tables):
    """Same result through the bucketed path and the plain shuffled
    path — co-location is a physical property, not a semantic one."""
    bo, bl = bucketed_tables
    bucketed = (
        spark.table(bo)
        .join(spark.table(bl), F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_orderkey", "qty", "rev")
    )
    plain = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
                F.sum("l_quantity").alias("qty"),
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                    "rev"
                ),
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select("o_orderkey", "qty", "rev")
    )
    a = sorted(tuple(r) for r in bucketed.collect())
    b = sorted(tuple(r) for r in plain.collect())
    assert a == b and a
