"""Array function family over the embedding column (SURVEY.md §2.8
fn_array / fn_array_hof / fn_explode).

Parity traps handled: DuckDB list functions are ``list_*`` / ``len`` and
1-based slices; float32 elements are cast to double BEFORE arithmetic in
BOTH engines so accumulation happens in identical precision (DuckDB
would otherwise multiply in float32 while Spark promotes to double).

Harness contract (CORRECTNESS_r05 lesson): the driver canonicalizes
results with pandas ``sort_values``, which raises ``TypeError:
unhashable type: 'list'`` on ANY array/map cell — even for rows-only
queries, since canonicalization runs before the oracle branch. So every
driver-visible array here is rendered as a deterministic scalar string:
elements are quantized to micro-unit BIGINTs (``floor(x*1e6 + 0.5)``,
the house rule from text.py's tfidf) and comma-joined. The array
*computation* (slice/sort/reverse/transform) still happens on real
ArrayType columns inside the plan; only the final projection is scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exprs import micro as _micro
from ..io import load
from ..registry import query


def _join_csv(arr):
    """Render a BIGINT array as a deterministic comma-joined string."""
    return F.array_join(F.transform(arr, lambda v: v.cast("string")), ",")


@query(
    "fn_array",
    oracle="""
        WITH q AS (
            SELECT vec_id, embedding,
                   list_transform(embedding[1:4],
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
                   ) AS head4_q
            FROM embeddings
        )
        SELECT vec_id,
               len(embedding)               AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_elem,
               array_to_string(list_transform(head4_q,
                   x -> CAST(x AS VARCHAR)), ',')                    AS head4,
               array_to_string(list_transform(list_sort(head4_q),
                   x -> CAST(x AS VARCHAR)), ',')                    AS head4_sorted,
               list_contains(embedding, 0.0)                         AS has_zero,
               array_to_string(list_transform(list_reverse(head4_q),
                   x -> CAST(x AS VARCHAR)), ',')                    AS head4_rev
        FROM q
    """,
    phase="P3",
    tags=("function", "array"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/slice/sort_array/array_contains/reverse.

    Array ops run on real ArrayType columns; the projection ships them
    as micro-quantized CSV strings (driver-hashable, see module doc).
    Sorting happens on the quantized ints (monotonic, so order matches
    sorting the raw floats except at sub-micro ties).
    """
    e = load(spark, sf_dir, "embeddings")
    head4_q = F.transform(F.slice("embedding", 1, 4), _micro)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        _join_csv(head4_q).alias("head4"),
        _join_csv(F.sort_array(head4_q)).alias("head4_sorted"),
        F.array_contains("embedding", F.lit(0.0).cast("float")).alias("has_zero"),
        _join_csv(F.reverse(head4_q)).alias("head4_rev"),
    )


@query(
    "fn_array_hof",
    oracle="""
        SELECT vec_id,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2_norm,
               list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))                           AS elem_sum,
               len(list_filter(embedding, x -> x > 0))                                              AS n_positive,
               array_to_string(list_transform(embedding[1:3],
                   x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 2.0 * 1000000.0 + 0.5) AS BIGINT) AS VARCHAR)
               ), ',')                                                                              AS head3_doubled
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
        _join_csv(
            F.transform(
                F.slice("embedding", 1, 3),
                lambda x: _micro(x.cast("double") * 2.0),
            )
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
