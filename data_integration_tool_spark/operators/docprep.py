"""End-to-end training-data preparation composites (SURVEY.md §2.10).

The single-operator text/dedup queries prove each step; these prove the
steps COMPOSE into the pipeline an LLM-data team actually runs — and
that the whole thing stays ONE lazy Catalyst plan (no intermediate
materialization, no Python):

    exact-dedup  →  quality gate  →  language gate  →  chunking

Scale shape: the dedup is a digest-keyed window-free arg-min (one
shuffle on md5, carrying one row per distinct digest after partial
agg); the gates are scan-level filters that Catalyst pushes below the
dedup where legal; chunking is an explode over computed chunk starts
(per-row fan-out, no shuffle). Measured plan at sf0.01: ONE wide
shuffle (the digest aggregate) + a broadcast join of the canonical ids
back onto documents; at 100 TB that join degrades to a keyed shuffle
join — still two exchanges total, nothing per-chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query
from .udfs import CHUNK_SIZE, CHUNK_STRIDE

MIN_TOKENS = 10  # quality gate: drop fragments
KEEP_LANGS = ("en", "de", "fr")  # language gate


@query(
    "pipeline_docs_prep",
    oracle=f"""
        WITH dedup AS (
            SELECT md5(text) AS digest, min(doc_id) AS doc_id
            FROM documents
            GROUP BY md5(text)
        ), kept AS (
            SELECT d.doc_id,
                   list_filter(string_split(lower(d.text), ' '), t -> t <> '') AS toks
            FROM documents d
            JOIN dedup ON d.doc_id = dedup.doc_id
            WHERE d.lang IN {KEEP_LANGS!r}
        ), gated AS (
            SELECT doc_id, toks, len(toks) AS n,
                   CASE WHEN len(toks) <= {CHUNK_SIZE} THEN 1
                        ELSE CAST(ceil((len(toks) - {CHUNK_SIZE}) / {CHUNK_STRIDE}.0) AS BIGINT) + 1
                   END AS nchunks
            FROM kept
            WHERE len(toks) >= {MIN_TOKENS}
        ), ks AS (
            SELECT doc_id, toks, n, unnest(range(nchunks)) AS k
            FROM gated
        )
        SELECT doc_id,
               k AS chunk_idx,
               array_to_string(
                   list_slice(toks, k * {CHUNK_STRIDE} + 1, k * {CHUNK_STRIDE} + {CHUNK_SIZE}), ' '
               ) AS chunk_text,
               least(k * {CHUNK_STRIDE} + {CHUNK_SIZE}, n) - k * {CHUNK_STRIDE} AS n_tokens
        FROM ks
    """,
    phase="P3",
    tags=("pipeline", "dedup", "text"),
)
def pipeline_docs_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data prep pipeline: exact-dedup (keep min doc_id per
    content digest) → language gate → min-token quality gate →
    overlapping token-window chunking. One declarative plan; see module
    docstring for the at-scale shuffle analysis."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    canonical = d.groupBy(F.md5(F.col("text").cast("binary")).alias("digest")).agg(
        F.min("doc_id").alias("doc_id")
    )
    toks = F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    kept = (
        d.filter(F.col("lang").isin(*KEEP_LANGS))
        .join(canonical.select("doc_id"), "doc_id")
        .select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
        .filter(F.col("n") >= MIN_TOKENS)
    )
    nchunks = F.when(F.col("n") <= CHUNK_SIZE, F.lit(1)).otherwise(
        F.ceil((F.col("n") - CHUNK_SIZE) / float(CHUNK_STRIDE)).cast("long") + 1
    )
    lo = F.col("chunk_idx").cast("int") * CHUNK_STRIDE
    n_tok = F.least(lo + CHUNK_SIZE, F.col("n")) - lo
    return (
        kept.withColumn(
            "chunk_idx", F.explode(F.sequence(F.lit(0).cast("long"), nchunks - 1))
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.array_join(F.slice("toks", lo + 1, CHUNK_SIZE), " ").alias("chunk_text"),
            n_tok.cast("long").alias("n_tokens"),
        )
    )


@query(
    "chunk_dedup",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), t -> t <> '')
                       AS toks
            FROM documents
        ), c AS (
            SELECT doc_id, toks, len(toks) AS n,
                   CASE WHEN len(toks) <= {CHUNK_SIZE} THEN 1
                        ELSE CAST(ceil((len(toks) - {CHUNK_SIZE})
                                       / {CHUNK_STRIDE}.0) AS BIGINT) + 1
                   END AS nchunks
            FROM tok
        ), ks AS (
            SELECT doc_id, toks, unnest(range(nchunks)) AS k
            FROM c
        ), chunks AS (
            SELECT doc_id,
                   md5(array_to_string(
                       list_slice(toks, k * {CHUNK_STRIDE} + 1,
                                  k * {CHUNK_STRIDE} + {CHUNK_SIZE}), ' '))
                       AS digest
            FROM ks
        )
        SELECT d.source,
               count(*) AS n_chunks,
               count(DISTINCT ch.digest) AS n_distinct,
               1.0 - count(DISTINCT ch.digest) / CAST(count(*) AS DOUBLE)
                   AS dup_rate
        FROM chunks ch
        JOIN documents d ON d.doc_id = ch.doc_id
        GROUP BY d.source
        ORDER BY d.source
    """,
    phase="P4",
    tags=("docprep", "dedup", "chunking"),
)
def chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup profile — the training-data question "how
    much of my corpus is duplicated at CHUNK grain, per source feed?"
    (overlapping chunks of templated docs collide far more than whole
    documents). Pure-expression chunking (sequence + slice, no Python)
    feeds an md5 digest; the per-source distinct counts the digest
    shuffle once. At 100 TB the digest groupBy pre-aggregates
    map-side; nothing holds a document's chunks in one place."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    t = d.select(
        "doc_id", "source", toks.alias("toks"), F.size(toks).alias("n")
    )
    nchunks = F.when(F.col("n") <= CHUNK_SIZE, F.lit(1)).otherwise(
        F.ceil((F.col("n") - CHUNK_SIZE) / F.lit(float(CHUNK_STRIDE))).cast(
            "bigint"
        )
        + 1
    )
    ks = t.select(
        "doc_id",
        "source",
        "toks",
        F.explode(F.sequence(F.lit(0), nchunks - 1)).alias("k"),
    )
    chunk_txt = F.concat_ws(
        " ",
        F.slice(
            F.col("toks"), F.col("k") * CHUNK_STRIDE + 1, F.lit(CHUNK_SIZE)
        ),
    )
    return (
        ks.select("source", F.md5(chunk_txt).alias("digest"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("digest").alias("n_distinct"),
        )
        .select(
            "source",
            "n_chunks",
            "n_distinct",
            (
                F.lit(1.0)
                - F.col("n_distinct") / F.col("n_chunks").cast("double")
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )
