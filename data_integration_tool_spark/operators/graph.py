"""Graph operators over relational edge lists (SURVEY.md §2.14).

dedup_components (operators/dedup.py) covers the driver-loop iterative
pattern with convergence checks; this module covers the FIXED-ITERATION
pattern: the loop unrolls into one lazy Catalyst plan, so the whole
computation is a single job with no driver-side state at all — and,
because the iteration count is fixed, the exact result is expressible
as chained SQL CTEs, giving an iterative graph algorithm a full value
oracle (rare: most engines only smoke-test PageRank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import query

_DAMPING = 0.85
_ITERS = 3


@query(
    "graph_pagerank",
    oracle="""
        WITH edges AS (
            SELECT event_type AS src, nxt AS dst, count(*) AS w
            FROM (
                SELECT event_type,
                       lead(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS nxt
                FROM events
            )
            WHERE nxt IS NOT NULL
            GROUP BY src, nxt
        ),
        norm AS (
            SELECT src, dst,
                   w / sum(w) OVER (PARTITION BY src) AS p
            FROM edges
        ),
        nodes AS (
            SELECT src AS node FROM edges
            UNION
            SELECT dst FROM edges
        ),
        nn AS (SELECT count(*) AS n FROM nodes),
        r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
        r1 AS (
            SELECT nd.node,
                   0.15 / (SELECT n FROM nn)
                   + 0.85 * coalesce(sum(r0.r * norm.p), 0) AS r
            FROM nodes nd
            LEFT JOIN norm ON norm.dst = nd.node
            LEFT JOIN r0 ON r0.node = norm.src
            GROUP BY nd.node
        ),
        r2 AS (
            SELECT nd.node,
                   0.15 / (SELECT n FROM nn)
                   + 0.85 * coalesce(sum(r1.r * norm.p), 0) AS r
            FROM nodes nd
            LEFT JOIN norm ON norm.dst = nd.node
            LEFT JOIN r1 ON r1.node = norm.src
            GROUP BY nd.node
        ),
        r3 AS (
            SELECT nd.node,
                   0.15 / (SELECT n FROM nn)
                   + 0.85 * coalesce(sum(r2.r * norm.p), 0) AS r
            FROM nodes nd
            LEFT JOIN norm ON norm.dst = nd.node
            LEFT JOIN r2 ON r2.node = norm.src
            GROUP BY nd.node
        )
        SELECT node, r AS pagerank FROM r3 ORDER BY node
    """,
    phase="P3",
    tags=("graph", "iterative"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 3 fixed iterations) over the
    event-type transition graph. The edge build is one lead() window +
    groupBy; transition probabilities normalize with a per-src window
    sum. Each iteration is contribution-join -> groupBy(dst) -> rank
    update, with the node count joined in as a broadcast single row
    (never a driver-side scalar). Three iterations unroll into ONE
    lazy plan. At a billion-edge scale the same loop runs with
    localCheckpoint per round (the dedup_components pattern) to stop
    lineage growth; dangling mass goes to teleport only — documented
    simplification, identical on both engines."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # The unrolled plan references the edge list ~2 per iteration; without
    # a lineage cut Catalyst re-executes the events window scan each time.
    # The reduced edge relation (|types|^2 rows) checkpoints once.
    edges = edges.localCheckpoint(eager=True)
    norm = edges.select(
        "src",
        "dst",
        (F.col("w") / F.sum("w").over(Window.partitionBy("src"))).alias("p"),
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    nn = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n")))
    ranks = nodes.crossJoin(nn).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(_ITERS):
        contrib = (
            norm.join(ranks, norm.src == ranks.node)
            .select("dst", (F.col("r") * F.col("p")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("incoming"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(nn)
            .select(
                "node",
                (
                    F.lit(1 - _DAMPING) / F.col("n")
                    + F.lit(_DAMPING) * F.coalesce(F.col("incoming"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("pagerank")).orderBy("node")
