"""Array function family over the embedding column (SURVEY.md §2.8
fn_array / fn_array_hof / fn_explode).

Parity traps handled: DuckDB list functions are ``list_*`` / ``len`` and
1-based slices; float32 elements are cast to double BEFORE arithmetic in
BOTH engines so accumulation happens in identical precision (DuckDB
would otherwise multiply in float32 while Spark promotes to double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "fn_array",
    oracle="""
        SELECT vec_id,
               len(embedding)                         AS dim,
               embedding[1]                           AS first_elem,
               embedding[1:4]                         AS head4,
               list_sort(embedding[1:4])              AS head4_sorted,
               list_contains(embedding, 0.0)          AS has_zero,
               list_reverse(embedding[1:4])           AS head4_rev
        FROM embeddings
    """,
    phase="P3",
    tags=("function", "array"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/slice/sort_array/array_contains/reverse."""
    e = load(spark, sf_dir, "embeddings")
    head4 = F.slice("embedding", 1, 4)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        head4.alias("head4"),
        F.sort_array(head4).alias("head4_sorted"),
        F.array_contains("embedding", F.lit(0.0).cast("float")).alias("has_zero"),
        F.reverse(head4).alias("head4_rev"),
    )


@query(
    "fn_array_hof",
    oracle="""
        SELECT vec_id,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2_norm,
               list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))                           AS elem_sum,
               len(list_filter(embedding, x -> x > 0))                                              AS n_positive,
               list_transform(embedding[1:3], x -> CAST(x AS DOUBLE) * 2.0)                         AS head3_doubled
        FROM embeddings
    """,
    phase="P3",
    tags=("function", "array", "hof"),
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambdas: transform/filter/aggregate (L2 norm etc.).

    All lambda arithmetic is forced to double on both engines so the
    in-order accumulation is bit-identical.
    """
    e = load(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    l2 = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return e.select(
        "vec_id",
        l2.alias("l2_norm"),
        F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x).alias("elem_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.transform(
            F.slice("embedding", 1, 3), lambda x: x.cast("double") * 2.0
        ).alias("head3_doubled"),
    )


@query(
    "fn_explode",
    oracle="""
        SELECT vec_id,
               t.i                     AS pos,
               CAST(t.x AS DOUBLE)     AS elem
        FROM embeddings,
             LATERAL (SELECT UNNEST(embedding[1:8]) AS x,
                             generate_subscripts(embedding[1:8], 1) AS i) t
    """,
    phase="P3",
    tags=("function", "array", "explode"),
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the first 8 embedding dims (UDTF-shaped).

    Output positions are 1-based to match SQL generate_subscripts.
    """
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", F.posexplode(F.slice("embedding", 1, 8)))
        .select(
            "vec_id",
            (F.col("pos") + 1).alias("pos"),
            F.col("col").cast("double").alias("elem"),
        )
    )
