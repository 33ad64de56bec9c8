"""Math function family (SURVEY.md §2.8 fn_math / fn_cast).

DuckDB parity traps: single-arg ``log`` is log10 in DuckDB but ln in
Spark — the oracle uses ``ln``/``log10`` explicitly. ``round`` is
excluded from the verified columns (half-even vs half-up divergence,
SURVEY.md §5); floor/ceil cover integer rounding deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "fn_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
               CAST(ceil(l_extendedprice) AS BIGINT)  AS price_ceil,
               abs(l_discount - 0.05)                 AS disc_dev,
               pow(l_quantity, 2)                     AS qty_sq,
               sqrt(l_extendedprice)                  AS price_sqrt,
               ln(l_extendedprice + 1)                AS price_ln,
               log10(l_extendedprice + 1)             AS price_log10,
               exp(l_discount)                        AS disc_exp,
               CAST(l_quantity AS BIGINT) % 7         AS qty_mod7,
               CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
        FROM lineitem
    """,
    phase="P2",
    tags=("function", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """floor/ceil/abs/pow/sqrt/ln/log10/exp/mod/sign."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.log(F.col("l_extendedprice") + 1).alias("price_ln"),
        F.log10(F.col("l_extendedprice") + 1).alias("price_log10"),
        F.exp("l_discount").alias("disc_exp"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@query(
    "fn_cast",
    oracle="""
        SELECT o_orderkey,
               CAST(floor(o_totalprice) AS BIGINT) AS price_int,
               CAST(o_orderkey AS DOUBLE)        AS key_double,
               CAST(o_orderkey AS VARCHAR)       AS key_str,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
               CAST('42' AS BIGINT)              AS const_int,
               CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS date_roundtrip
        FROM orders
    """,
    phase="P2",
    tags=("function", "cast"),
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts across int/double/string/date/timestamp.

    double→string is deliberately absent: Spark and DuckDB format
    doubles differently (scientific-notation thresholds), so that cast
    can never be hash-verified. int→string is format-stable.
    """
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        # floor first: DuckDB's double→int cast rounds, Spark's truncates
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
        F.col("o_orderkey").cast("double").alias("key_double"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        # date→string instead of bare DATE output: 'YYYY-MM-DD' formats
        # identically in both engines, whereas a DATE column rides through
        # pandas as datetime.date on one side and datetime64 on the other
        # depending on the fetch path — strings are hash-stable everywhere.
        F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
        F.lit("42").cast("bigint").alias("const_int"),
        F.col("o_orderdate").cast("date").cast("timestamp").alias("date_roundtrip"),
    )


@query(
    "fn_bitwise",
    oracle="""
        SELECT l_orderkey,
               l_orderkey & 255                  AS k_and,
               l_orderkey | 4096                 AS k_or,
               xor(l_orderkey, l_partkey)        AS k_xor,
               l_linenumber << 3                 AS ln_shl,
               l_orderkey >> 2                   AS k_shr,
               ~l_orderkey                       AS k_not
        FROM lineitem
        WHERE l_orderkey <= 1000
    """,
    phase="P3",
    tags=("fn", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR/shift/NOT over integer keys — all codegen
    expressions evaluated in the scan stage."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("k_and"),
        F.col("l_orderkey").bitwiseOR(F.lit(4096)).alias("k_or"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("k_xor"),
        F.shiftleft(F.col("l_linenumber"), 3).alias("ln_shl"),
        F.shiftright(F.col("l_orderkey"), 2).alias("k_shr"),
        F.bitwise_not(F.col("l_orderkey")).alias("k_not"),
    )


@query(
    "fn_conditional",
    oracle="""
        SELECT o_orderkey,
               coalesce(nullif(o_orderstatus, 'P'), 'PENDING')   AS status_filled,
               greatest(o_totalprice, 100000.0)                  AS price_floor,
               least(o_totalprice, 400000.0)                     AS price_cap,
               if(o_orderpriority = '1-URGENT', 1, 0)            AS is_urgent
        FROM orders
    """,
    phase="P3",
    tags=("fn", "conditional"),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar family: coalesce/nullif/greatest/least/if —
    the null-handling surface every mapping spec leans on."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
        ).alias("status_filled"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("price_floor"),
        F.least(F.col("o_totalprice"), F.lit(400000.0)).alias("price_cap"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias(
            "is_urgent"
        ),
    )


@query(
    "fn_winsorize",
    oracle="""
        WITH bounds AS (
            SELECT event_type,
                   quantile_disc(value, 0.01) AS lo,
                   quantile_disc(value, 0.99) AS hi
            FROM events GROUP BY event_type
        )
        SELECT e.event_id, e.event_type, e.value,
               b.lo, b.hi,
               CASE WHEN e.value < b.lo THEN b.lo
                    WHEN e.value > b.hi THEN b.hi
                    ELSE e.value END AS clipped,
               CAST(CASE WHEN e.value < b.lo OR e.value > b.hi
                         THEN 1 ELSE 0 END AS BIGINT) AS was_clipped
        FROM events e JOIN bounds b USING (event_type)
        ORDER BY e.event_id
    """,
    phase="P2",
    tags=("function", "robust", "winsorize"),
)
def fn_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: clip each event's value to its
    event_type's [p1, p99] band — the standard outlier-clipping
    transform before computing means/stds or feeding features to
    training. DISCRETE percentiles (actual data values, no
    interpolation) keep every output a raw stored double → hash-exact
    across engines, the anomaly_mad house rule.

    Plan: one sort-based grouped percentile agg over the handful of
    event types, broadcast back onto the scan; the clip itself is a
    map-side CASE. At 100 TB the bounds relation is KB-sized whatever
    the row count — the data never shuffles at all.
    """
    e = load(spark, sf_dir, "events")
    bounds = e.groupBy("event_type").agg(
        F.expr("percentile_disc(0.01) WITHIN GROUP (ORDER BY value)").alias("lo"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").alias("hi"),
    )
    return (
        e.join(F.broadcast(bounds), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            "lo",
            "hi",
            F.when(F.col("value") < F.col("lo"), F.col("lo"))
            .when(F.col("value") > F.col("hi"), F.col("hi"))
            .otherwise(F.col("value"))
            .alias("clipped"),
            ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
            .cast("bigint")
            .alias("was_clipped"),
        )
        .orderBy("event_id")
    )
