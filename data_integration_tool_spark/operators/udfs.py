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
    the twin-check against the built-in expression would catch.

    The reduction is np.cumsum(...)[-1], NOT np.dot/np.sum: cumsum is
    defined sequentially, so the accumulation is the same LEFT-TO-RIGHT
    float64 fold as Spark's F.aggregate and DuckDB's list_sum —
    bit-identical, which is what lets this pandas-UDF query carry a
    full value oracle. np.dot/np.sum use pairwise/SIMD summation and
    differ at the last ULP."""
    def norm(v) -> float:
        sq = np.asarray(v, dtype=np.float64)
        sq *= sq
        return float(np.sqrt(np.cumsum(sq)[-1])) if sq.size else 0.0

    return emb.map(norm)


@F.pandas_udf(T.DoubleType())
def _pd_weighted_avg(price: pd.Series, qty: pd.Series) -> float:
    """GROUPED_AGG pandas UDF: quantity-weighted average price."""
    q = qty.sum()
    return float((price * qty).sum() / q) if q else float("nan")


@query(
    "udf_pandas_norm",
    oracle="""
        SELECT vec_id,
               sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                   AS l2_norm_udf
        FROM embeddings
    """,
    phase="P3",
    tags=("udf", "pandas"),
)
def udf_pandas_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF computing embedding L2 norms — fully oracled:
    the kernel's cumsum reduction reproduces the SQL left fold exactly
    (see _pd_l2_norm), so raw doubles hash-match DuckDB's
    sqrt(list_sum(...)). pytest additionally twins it against
    fn_array_hof's expression-based l2_norm."""
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
    oracle="""
        WITH g AS (
            SELECT user_id,
                   date_diff('second',
                             lag(CAST(ts AS TIMESTAMP)) OVER (
                                 PARTITION BY user_id
                                 ORDER BY CAST(ts AS TIMESTAMP), event_id),
                             CAST(ts AS TIMESTAMP)) AS gap
            FROM events
        )
        SELECT user_id,
               count(*)                      AS n_events,
               avg(gap)                      AS mean_gap_sec,
               CAST(max(gap) AS DOUBLE)      AS max_gap_sec
        FROM g GROUP BY user_id
    """,
    phase="P4",
    tags=("udf", "applyinpandas"),
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event gap statistics (mean/max seconds between
    consecutive events) — a whole-group computation that genuinely
    needs imperative code.

    Implementation note: the obvious form — groupBy(user).applyInPandas
    with a per-group kernel — pays one Arrow round trip per group
    (~3.5 ms × 1500 users ≈ the whole query). With many small groups
    the scalable shape is repartition by key + sortWithinPartitions +
    ONE vectorized pandas groupby per partition: same rows, same
    grouping guarantee (repartition co-locates each user), thousands of
    groups amortized into one Arrow batch stream. The per-group
    applyInPandas pattern is still the right call for FEW, LARGE groups
    — see the pairwise similarity kernels.

    Columns are pruned BEFORE the exchange: Catalyst cannot see inside
    a Python UDF, so without the explicit select every event column —
    including the wide JSON props strings — would cross the Arrow
    boundary just to be ignored.
    """
    import numpy as np

    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("mean_gap_sec", T.DoubleType()),
            T.StructField("max_gap_sec", T.DoubleType()),
        ]
    )

    def gaps_fn(batches):
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        # WHOLE-second gaps (epoch-floor diff): integer-valued floats
        # sum exactly in float64 regardless of accumulation order, so
        # pandas mean == SQL avg bit-for-bit and the query carries a
        # full oracle (the seq_inter_arrival trick) — fractional-second
        # gaps would reintroduce summation-order ULP noise.
        sec = pdf["ts"].astype("int64") // 1_000_000_000
        gap = sec.diff()
        # first row of each user must not inherit the previous user's gap.
        # mask() returns a fresh Series — an in-place write into a view
        # raises SettingWithCopyWarning and pandas may discard it.
        first = pdf.groupby("user_id", sort=False).cumcount() == 0
        gap = gap.mask(first.to_numpy())
        stats = (
            pd.DataFrame({"user_id": pdf["user_id"], "gap": gap})
            .groupby("user_id", sort=False)["gap"]
            .agg(n_events="size", mean_gap_sec="mean", max_gap_sec="max")
            .reset_index()
        )
        # all-NaN groups (single event) must surface as SQL NULL
        stats = stats.astype(object).where(pd.notna(stats), None)
        yield stats

    return e.repartition("user_id").mapInPandas(gaps_fn, out_schema)


@query(
    "udf_map_in_pandas",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS t
            FROM documents
        )
        SELECT doc_id,
               len(t) AS n_tokens,
               CASE WHEN len(t) > 0
                    THEN CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
                    ELSE 0.0 END AS uniq_ratio
        FROM toks
    """,
    phase="P4",
    tags=("udf", "mapinpandas"),
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas: per-partition Arrow-batch transform (tokenize +
    score) — the plumbing shape used for multimodal decode at scale.
    No shuffle: batches flow straight from the scan. Fully oracled
    despite the Python kernel: every output is per-ROW deterministic
    (batch boundaries cannot change values), n_tokens is an int and
    uniq_ratio is one small-int division — bit-identical IEEE on both
    engines. Python's split(' ') and DuckDB's string_split both KEEP
    empty tokens, so the token counts line up on multi-space text."""
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


CHUNK_SIZE = 32  # tokens per chunk (LLM context-window chunking shape)
CHUNK_STRIDE = 24  # overlap of CHUNK_SIZE - CHUNK_STRIDE = 8 tokens


@query(
    "udtf_chunk_docs",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
            FROM documents
        ), c AS (
            SELECT doc_id, toks, len(toks) AS n,
                   CASE WHEN len(toks) <= {CHUNK_SIZE} THEN 1
                        ELSE CAST(ceil((len(toks) - {CHUNK_SIZE}) / {CHUNK_STRIDE}.0) AS BIGINT) + 1
                   END AS nchunks
            FROM tok
        ), ks AS (
            SELECT doc_id, toks, n, unnest(range(nchunks)) AS k
            FROM c
        )
        SELECT doc_id,
               k AS chunk_idx,
               array_to_string(
                   list_slice(toks, k * {CHUNK_STRIDE} + 1, k * {CHUNK_STRIDE} + {CHUNK_SIZE}), ' '
               ) AS chunk_text,
               least(k * {CHUNK_STRIDE} + {CHUNK_SIZE}, n) - k * {CHUNK_STRIDE} AS n_tokens
        FROM ks
    """,
    phase="P4",
    tags=("udf", "udtf", "text"),
)
def udtf_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF splitting each document into overlapping token-window
    chunks (size 32, stride 24) — the LLM-ingest chunking shape, and the
    one SURVEY §2.11 row that genuinely wants a table function: one input
    row yields a variable number of typed output rows.

    Arrow-optimized (``useArrow=True``) so batches cross the Python
    boundary columnar; invoked via SQL LATERAL, which is how a UDTF
    composes with the rest of a query plan (per-partition, no shuffle —
    the lateral fan-out never leaves the scan task). An explode-shaped
    expression twin exists (tests/test_algorithms.py) proving the same
    result is expressible without Python; the UDTF form is the API
    surface a user would reach for when the chunker is a real tokenizer.
    """
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "doc_id: bigint, chunk_idx: bigint, chunk_text: string, n_tokens: bigint"
        ),
        useArrow=True,
    )
    class ChunkDocs:
        def eval(self, doc_id, text):
            toks = [t for t in text.lower().split(" ") if t]
            n = len(toks)
            if n <= CHUNK_SIZE:
                nchunks = 1
            else:
                nchunks = -((n - CHUNK_SIZE) // -CHUNK_STRIDE) + 1
            for k in range(nchunks):
                lo = k * CHUNK_STRIDE
                hi = min(lo + CHUNK_SIZE, n)
                yield doc_id, k, " ".join(toks[lo:hi]), hi - lo

    spark.udtf.register("chunk_docs", ChunkDocs)
    load(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT c.* FROM _udtf_docs, LATERAL chunk_docs(doc_id, text) AS c"
    )


def chunk_docs_explode_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression-only twin of udtf_chunk_docs (pytest cross-check):
    sequence() over chunk starts + slice() of the token array."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    t = d.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    nchunks = F.when(F.col("n") <= CHUNK_SIZE, F.lit(1)).otherwise(
        F.ceil((F.col("n") - CHUNK_SIZE) / float(CHUNK_STRIDE)).cast("long") + 1
    )
    t = t.withColumn(
        "chunk_idx", F.explode(F.sequence(F.lit(0).cast("long"), nchunks - 1))
    )
    lo = F.col("chunk_idx").cast("int") * CHUNK_STRIDE
    n_tok = F.least(lo + CHUNK_SIZE, F.col("n")) - lo
    return t.select(
        "doc_id",
        "chunk_idx",
        F.array_join(F.slice("toks", lo + 1, CHUNK_SIZE), " ").alias("chunk_text"),
        n_tok.cast("long").alias("n_tokens"),
    )


EWMA_ALPHA = 0.3


@query(
    "win_ewma",
    oracle="""
        WITH RECURSIVE base AS (
            SELECT user_id, event_id, value,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
            FROM events
        ), r AS (
            SELECT user_id, event_id, value, rn, value AS ewma
            FROM base WHERE rn = 1
            UNION ALL
            SELECT b.user_id, b.event_id, b.value, b.rn,
                   (CAST(1 AS DOUBLE) - CAST(0.3 AS DOUBLE)) * r.ewma
                   + CAST(0.3 AS DOUBLE) * b.value
            FROM r JOIN base b
              ON b.user_id = r.user_id AND b.rn = r.rn + 1
        )
        SELECT user_id, event_id, value, ewma FROM r
    """,
    phase="P4",
    tags=("udf", "timeseries", "ewma"),
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of event value per user —
    the canonical op a SQL window CANNOT express (each output depends
    recursively on the previous output, not on a frame of inputs), so
    it takes the sanctioned Arrow path: repartition by user, sort
    within partitions, ONE vectorized pandas ewm per partition batch
    (same many-small-groups strategy as udf_apply_in_pandas — no
    per-group Arrow round trips). Deterministic: ordering carries the
    unique event_id tiebreaker.

    FULLY oracled as of late r6 (was rows-only): pandas
    ewm(adjust=False) is bitwise the plain recursion
    y = (1-α)·y_prev + α·x (verified: its weight normalization divides
    by exactly 1.0 for α = 0.3), and a DuckDB recursive CTE stepping
    rn → rn+1 per user computes the identical double expression — so
    even this per-row-recursive Python kernel gets a raw value hash.
    The oracle's constants are CAST to DOUBLE so 1−α is the same
    binary subtraction pandas performs (decimal 0.7 ≠ double 1.0−0.3
    in the last ULP)."""
    e = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )

    def ewma_fn(batches):
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        pdf["ewma"] = (
            pdf.groupby("user_id", sort=False)["value"]
            .transform(lambda s: s.ewm(alpha=EWMA_ALPHA, adjust=False).mean())
        )
        yield pdf[["user_id", "event_id", "value", "ewma"]]

    return e.repartition("user_id").mapInPandas(ewma_fn, out_schema)


@query(
    "udf_map_in_arrow",
    oracle="""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_bytes,
               CAST(length(replace(text, ' ', '')) AS BIGINT)
                   AS n_nonspace,
               upper(substring(text, 1, 8)) AS head_upper
        FROM documents
        ORDER BY doc_id
    """,
    phase="P4",
    tags=("udf", "mapinarrow"),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the FOURTH and lowest-overhead Python boundary
    (beside pandas UDF / grouped agg / mapInPandas): batches cross as
    raw Arrow RecordBatches and the kernel runs pyarrow.compute
    vectorized ops with NO pandas materialization — no index, no
    object-dtype boxing, zero-copy on the string buffers. The kernel
    here (byte length, non-space length, uppercased head) is chosen to
    be expressible in SQL so the whole Arrow path is value-oracled
    (the fixture's ASCII text makes length() byte-equal cross-engine).

    At 100 TB this is the boundary you want for byte-level feature
    extraction over documents: Arrow string ops run at memory
    bandwidth, and the exchange-free map stage scales with the scan.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    d = load(spark, sf_dir, "documents").select("doc_id", "text")

    def kernel(batches):
        for batch in batches:
            text = batch.column(1)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pc.cast(pc.binary_length(text), pa.int64()),
                    pc.cast(
                        pc.binary_length(
                            pc.replace_substring(text, " ", "")
                        ),
                        pa.int64(),
                    ),
                    pc.utf8_upper(pc.utf8_slice_codeunits(text, 0, 8)),
                ],
                ["doc_id", "n_bytes", "n_nonspace", "head_upper"],
            )

    out_schema = (
        "doc_id bigint, n_bytes bigint, n_nonspace bigint, head_upper string"
    )
    return d.mapInArrow(kernel, out_schema).orderBy("doc_id")


XOVER_FAST = 0.3  # fast EWMA alpha (reuses win_ewma's verified 0.3)
XOVER_SLOW = 0.1  # slow EWMA alpha


@query(
    "ts_ewma_crossover",
    oracle="""
        WITH RECURSIVE base AS (
            SELECT user_id, event_id, value,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
            FROM events
        ), r AS (
            SELECT user_id, event_id, rn, value AS f, value AS s
            FROM base WHERE rn = 1
            UNION ALL
            SELECT b.user_id, b.event_id, b.rn,
                   (CAST(1 AS DOUBLE) - CAST(0.3 AS DOUBLE)) * r.f
                   + CAST(0.3 AS DOUBLE) * b.value,
                   (CAST(1 AS DOUBLE) - CAST(0.1 AS DOUBLE)) * r.s
                   + CAST(0.1 AS DOUBLE) * b.value
            FROM r JOIN base b
              ON b.user_id = r.user_id AND b.rn = r.rn + 1
        ), d AS (
            SELECT user_id, event_id, f, s, f - s AS diff,
                   lag(f - s) OVER (
                       PARTITION BY user_id ORDER BY rn) AS prev_diff
            FROM r
        )
        SELECT user_id, event_id,
               CASE WHEN diff > 0 THEN 'up' ELSE 'down' END AS direction,
               CAST(floor(f * 1000000.0 + 0.5) AS BIGINT) AS fast_micro,
               CAST(floor(s * 1000000.0 + 0.5) AS BIGINT) AS slow_micro
        FROM d
        WHERE prev_diff * diff < 0
        ORDER BY user_id, event_id
    """,
    phase="P4",
    tags=("udf", "timeseries", "ewma", "signal"),
)
def ts_ewma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast/slow EWMA crossover detection per user — the classic
    signal-generation shape (golden cross / death cross): two
    exponential averages of event value (alpha 0.3 vs 0.1) tracked per
    user in event order; a signal fires whenever their difference
    changes sign, 'up' when the fast line breaks above the slow one.

    Same sanctioned Arrow path as win_ewma (per-row recursion is the
    one thing SQL windows cannot express): repartition by user, ONE
    vectorized pandas kernel computes BOTH ewm lines, the sign-change
    filter and direction per batch — no second shuffle, the lag rides
    the same per-user sort the recursion needed anyway. FULLY oracled
    via the win_ewma recursive-CTE technique carrying two accumulators:
    pandas ewm(adjust=False) is bitwise the plain recursion for both
    alphas ((1-a)+a rounds to exactly 1.0 in IEEE for 0.3 AND 0.1, so
    the weight normalization divides by 1.0), the sign test compares
    identical doubles, and the reported levels ship micro-quantized."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("direction", T.StringType()),
            T.StructField("fast_micro", T.LongType()),
            T.StructField("slow_micro", T.LongType()),
        ]
    )

    def xover_fn(batches):
        import numpy as np

        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        g = pdf.groupby("user_id", sort=False)["value"]
        fast = g.transform(
            lambda sr: sr.ewm(alpha=XOVER_FAST, adjust=False).mean()
        )
        slow = g.transform(
            lambda sr: sr.ewm(alpha=XOVER_SLOW, adjust=False).mean()
        )
        diff = fast - slow
        prev = diff.groupby(pdf["user_id"], sort=False).shift(1)
        hit = (prev * diff) < 0
        out = pd.DataFrame(
            {
                "user_id": pdf.loc[hit, "user_id"],
                "event_id": pdf.loc[hit, "event_id"],
                "direction": np.where(diff[hit] > 0, "up", "down"),
                "fast_micro": np.floor(
                    fast[hit] * 1000000.0 + 0.5
                ).astype("int64"),
                "slow_micro": np.floor(
                    slow[hit] * 1000000.0 + 0.5
                ).astype("int64"),
            }
        )
        yield out

    return (
        e.repartition("user_id")
        .mapInPandas(xover_fn, out_schema)
        .orderBy("user_id", "event_id")
    )


@query(
    "udtf_sentence_split",
    oracle="""
        WITH sents AS (
            SELECT doc_id,
                   list_filter(list_transform(
                       regexp_split_to_array(text, '[.!?]+'),
                       s -> trim(s)), s -> s <> '') AS ss
            FROM documents
        )
        SELECT doc_id,
               CAST(i - 1 AS BIGINT) AS sent_idx,
               ss[i] AS sentence,
               CAST(len(list_filter(string_split(ss[i], ' '),
                        t -> t <> '')) AS BIGINT) AS n_tokens
        FROM sents, unnest(range(1, len(ss) + 1)) AS g(i)
        ORDER BY doc_id, sent_idx
    """,
    phase="P4",
    tags=("udtf", "text"),
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF splitting each document into sentences on
    terminal-punctuation runs ([.!?]+) — the second genuinely
    table-valued shape in §2.11 after udtf_chunk_docs: one doc yields
    a variable number of typed sentence rows (index, text, token
    count), the granularity sentence-level dedup, PII scanning, and
    quality filters operate at.

    Arrow-optimized UDTF invoked via SQL LATERAL (per-partition
    fan-out, no shuffle). The Python side strips exactly the space
    characters DuckDB's trim() strips, so the twin — regexp split +
    list_filter + generate_subscripts — is value-identical; empty
    segments (leading punctuation, trailing terminator) are dropped
    on both sides BEFORE indexing, so sent_idx counts surviving
    sentences only.

    At 100 TB this is a map-only stage: the lateral never leaves the
    scan task and downstream sentence-grain operators shuffle on the
    sentence keys they need.

    r13: the final global sort used to sit directly on the lateral —
    and a global sort's range-partitioner SAMPLES its child first, so
    the Python UDTF executed TWICE per action (phase split: lateral
    alone 0.81 s, full query 1.72 s). A lazy localCheckpoint under the
    orderBy materializes the sentence relation once and lets both the
    sampling pass and the sort read it back: 1.64/1.66 s -> 0.91/0.93 s
    min/med of 5 under bench conf. The checkpoint bytes are the same
    order as the sort's own exchange spill, so the scale posture is
    unchanged — it exists to keep the corpus-scale Python pass from
    running twice. (A precompiled-regex eval body measured at parity —
    re's pattern cache already amortizes the compile — and the
    DataFrame-orderBy siblings [applyInPandas/mapInPandas tails] all
    measured within noise of +-7%: their Python is cheap relative to
    the sort, or AQE already materializes the child stage. This UDTF
    is the one query where the resample genuinely doubled a heavy
    Python pass; scratch/r13o_sort_resample_ab.py.)"""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "doc_id: bigint, sent_idx: bigint, sentence: string,"
            " n_tokens: bigint"
        ),
        useArrow=True,
    )
    class SentenceSplit:
        def eval(self, doc_id, text):
            import re

            idx = 0
            for seg in re.split(r"[.!?]+", text):
                s = seg.strip(" ")
                if not s:
                    continue
                yield doc_id, idx, s, len(
                    [t for t in s.split(" ") if t]
                )
                idx += 1

    spark.udtf.register("sentence_split", SentenceSplit)
    load(spark, sf_dir, "documents").createOrReplaceTempView(
        "_udtf_sent_docs"
    )
    lat = spark.sql(
        "SELECT s.* FROM _udtf_sent_docs,"
        " LATERAL sentence_split(doc_id, text) AS s"
    )
    return lat.localCheckpoint(eager=False).orderBy("doc_id", "sent_idx")
