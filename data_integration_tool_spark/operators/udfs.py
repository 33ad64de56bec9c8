"""UDF / UDAF / UDTF surface (SURVEY.md §2.11).

Policy: built-in expressions first — every UDF here has a built-in twin
that pytest compares against, because Python rows are the slow path.
When Python is genuinely needed the sanctioned shape is the Arrow-batched
pandas UDF (vectorized, ~10-100× over row-at-a-time); these queries are
registered rows-only (numpy's pairwise summation differs from the SQL
engines' in-order fold at the last ulp, so a hash-exact oracle would be
a false failure).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load
from ..registry import query


@F.pandas_udf(T.DoubleType())
def _pd_l2_norm(emb: pd.Series) -> pd.Series:
    """Vectorized L2 norm over Arrow-batched embedding arrays.

    Arrow delivers float32 element arrays — promote to float64 BEFORE
    the dot product or the result carries float32 error (~1e-8), which
    the twin-check against the built-in expression would catch."""
    return emb.map(
        lambda v: float(np.sqrt(np.dot(np.asarray(v, dtype=np.float64), np.asarray(v, dtype=np.float64))))
    )


@F.pandas_udf(T.DoubleType())
def _pd_weighted_avg(price: pd.Series, qty: pd.Series) -> float:
    """GROUPED_AGG pandas UDF: quantity-weighted average price."""
    q = qty.sum()
    return float((price * qty).sum() / q) if q else float("nan")


@query(
    "udf_pandas_norm",
    oracle=None,  # numpy pairwise-sum ≠ SQL in-order fold at the last ulp
    phase="P3",
    tags=("udf", "pandas"),
)
def udf_pandas_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF computing embedding L2 norms.

    pytest asserts |udf - builtin_twin| < 1e-9 per row (the twin is
    fn_array_hof's expression-based l2_norm).
    """
    e = load(spark, sf_dir, "embeddings")
    return e.select("vec_id", _pd_l2_norm("embedding").alias("l2_norm_udf"))


@query(
    "udf_grouped_agg",
    oracle="""
        SELECT l_returnflag,
               sum(l_extendedprice * l_quantity) / sum(l_quantity) AS weighted_avg_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    phase="P3",
    tags=("udf", "udaf"),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price — expressed with built-ins so the
    oracle hash-matches; the pandas GROUPED_AGG twin of this exact
    computation is exercised in pytest (test_udfs.py) against it.

    At scale the built-in form is strictly better: two map-side partial
    sums vs shuffling whole groups to Python workers.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (
            F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
            / F.sum("l_quantity")
        ).alias("weighted_avg_price")
    )


def grouped_agg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas-UDAF twin of udf_grouped_agg (pytest-only)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _pd_weighted_avg("l_extendedprice", "l_quantity").alias("weighted_avg_price")
    )


@query(
    "udf_apply_in_pandas",
    oracle=None,  # float accumulation order differs → pytest twin check
    phase="P4",
    tags=("udf", "applyinpandas"),
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: per-user event gap statistics (mean seconds
    between consecutive events) — a whole-group computation that
    genuinely needs imperative code.

    Each group arrives as ONE pandas DataFrame; groups stream through
    executors in parallel, so this scales as long as no single key is
    huge (events are user-keyed — bounded)."""
    e = load(spark, sf_dir, "events")

    def gap_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        gaps = pdf["ts"].diff().dt.total_seconds().dropna()
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "mean_gap_sec": [float(gaps.mean()) if len(gaps) else None],
                "max_gap_sec": [float(gaps.max()) if len(gaps) else None],
            }
        )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("mean_gap_sec", T.DoubleType()),
            T.StructField("max_gap_sec", T.DoubleType()),
        ]
    )
    return e.groupBy("user_id").applyInPandas(gap_stats, schema=out_schema)


@query(
    "udf_map_in_pandas",
    oracle=None,  # partition-shape dependent batching → pytest invariants
    phase="P4",
    tags=("udf", "mapinpandas"),
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas: per-partition Arrow-batch transform (tokenize +
    score) — the plumbing shape used for multimodal decode at scale.
    No shuffle: batches flow straight from the scan."""
    d = load(spark, sf_dir, "documents")

    def score_batches(batches):
        for pdf in batches:
            toks = pdf["text"].str.lower().str.split(" ")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": toks.map(len).astype("int64"),
                    "uniq_ratio": toks.map(
                        lambda t: len(set(t)) / len(t) if t else 0.0
                    ),
                }
            )

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("uniq_ratio", T.DoubleType()),
        ]
    )
    return d.mapInPandas(score_batches, schema=out_schema)
