"""True Structured Streaming layer (SURVEY.md §2.9 P4).

The batch operators in ``event_windows.py`` define the verified
semantics; this module runs the same event-time logic as real streams:
``readStream`` source → watermark → windowed/sessionized aggregation →
sink. Tested with availableNow + memory sink (pytest), which exercises
the actual streaming engine (incremental state store, watermark
advancement), not a batch re-run.

The parquet streaming source cannot read the fixtures' TIMESTAMP(NANOS)
column even with nanosAsLong, so streams are driven from a re-typed
copy of events (helper ``stage_events_stream``) — at deployment the
source would be Kafka/files with µs timestamps anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load


def stage_events_stream(
    spark: SparkSession, sf_dir: str, stage_dir: str, n_files: int = 4
) -> None:
    """Materialize events as a multi-file µs-timestamp parquet directory
    usable as a file-stream source (each file becomes a micro-batch
    under maxFilesPerTrigger=1)."""
    load(spark, sf_dir, "events").repartition(n_files).write.mode(
        "overwrite"
    ).parquet(stage_dir)


def read_events_stream(spark: SparkSession, stage_dir: str) -> DataFrame:
    """Open the staged events directory as a streaming source."""
    schema = spark.read.parquet(stage_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )


def tumbling_counts_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of batch ``stream_tumbling``: 1-hour event-time
    tumbling windows with late-data handling via watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming sessionization via session_window (the native stateful
    operator; batch twin is the gap-and-cumsum in event_windows.py).

    The watermark is load-bearing for parity harnesses: the staged
    4-file source replays events in RANDOM order across micro-batches,
    so a production-tight watermark silently drops "late" events before
    session merging (observed: ~half the sessions shifted or merged
    wrong). Reconciliation harnesses pass an effectively-infinite
    watermark (the foreachBatch harness's trick); production streams
    with near-ordered sources keep it tight to bound state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming dedup on (user_id, event_type) with bounded state:
    the watermark lets the state store evict old keys — without it,
    state grows forever at 100 TB."""
    return events.withWatermark("ts", watermark).dropDuplicates(
        ["user_id", "event_type"]
    )


def run_to_memory(
    spark: SparkSession, streaming_df: DataFrame, table_name: str, mode: str = "append"
) -> None:
    """Drain the stream into an in-memory sink (availableNow: process
    everything staged, then stop — the batch-parity harness)."""
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def run_foreach_batch(
    spark: SparkSession, streaming_df: DataFrame, batch_fn, mode: str = "update"
) -> None:
    """foreachBatch sink: each micro-batch arrives as a regular
    DataFrame for arbitrary batch-side logic (upserts, multi-sink)."""
    q = (
        streaming_df.writeStream.foreachBatch(batch_fn)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running totals (event count, value sum, last-seen ts) carried across
    micro-batches in the state store.

    This is the escape hatch for stateful logic the built-in windowed
    aggregations can't express (per-key custom accumulators, decaying
    counters, model state). State is per user_id — at 100 TB the state
    store shards by the grouping key across executors, so the pattern
    scales horizontally; the emitted row per key per batch keeps output
    bounded. Arrow moves each group's batch rows as pandas DataFrames.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
            StructField("last_ts", TimestampType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("last_us", LongType()),
        ]
    )

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                batch_max = pdf["ts"].max()
                last_us = max(last_us, int(batch_max.value // 1000))
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def enriched_stream(events: DataFrame, customers: DataFrame) -> DataFrame:
    """STREAM-STATIC join: enrich each streaming event with the static
    customer dimension (user_id = c_custkey in the fixtures). The
    static side behaves like a broadcast lookup re-resolved per
    micro-batch — no state store involved, so it scales with the dim
    size, not the stream history."""
    dim = customers.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation"),
    )
    return events.join(dim, "user_id").select(
        "event_id", "user_id", "ts", "event_type", "value", "segment", "nation"
    )


def click_purchase_join_stream(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """STREAM-STREAM join with watermarks: clicks joined to the same
    user's purchases within 24 h after the click. Both sides carry
    watermarks and the join condition bounds event-time distance, so
    the state store can evict rows once the other side's watermark
    passes — the condition IS the state-retention contract (an
    unbounded stream-stream join would grow state forever).

    The watermark is the completeness/state trade: micro-batches that
    arrive out of event-time order (the staged fixture files are
    unordered, like real backfill) lose matches older than the
    watermark. The batch-parity test passes a watermark wider than the
    data span (exact results); production uses a tight one and accepts
    bounded late-drop."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 24 HOURS")),
    ).select("c_user", "click_id", "click_ts", "purchase_id", "purchase_ts")


# -- driver-visible surface -------------------------------------------------
# The helpers above are pytest-exercised; this registered query makes the
# TRUE streaming engine (incremental state store, watermark advancement,
# availableNow drain) visible to the driver's correctness harness as a
# rows-only reconciliation against the batch twin.

from ..registry import query  # noqa: E402


@query(
    "stream_true_engine",
    # FULL oracle (r8 upgrade, VERDICT r7 Next #6): the summary row is
    # deterministic from events — if the engine reconciles, n_windows =
    # |distinct (hour, event_type)| and all_match is TRUE, so DuckDB
    # can assert the whole row and any engine/batch divergence
    # (one-sided window, count or total mismatch) goes driver hash-RED
    # instead of merely rows>0.
    oracle="""
        WITH g AS (
            SELECT CAST(count(*) AS BIGINT) AS n FROM (
                SELECT DISTINCT
                       date_trunc('hour', CAST(ts AS TIMESTAMP)),
                       event_type
                FROM events))
        SELECT n AS n_windows, n AS n_stream, n AS n_batch,
               TRUE AS all_match
        FROM g
    """,
    phase="P4",
    # bench-skip: this is a two-sided verification harness (staging
    # write + 4 micro-batches + batch twin + reconciliation join), not
    # an operator throughput measure — bench.py logs the exclusion
    tags=("streaming", "engine", "bench-skip"),
)
def stream_true_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Structured Streaming, driver-visible: stage events as a
    4-file parquet stream source, run readStream → watermark → 1-hour
    tumbling windows through the real incremental engine (availableNow,
    maxFilesPerTrigger=1 → 4 micro-batches, complete mode so trailing
    windows above the watermark still emit), then reconcile the drained
    memory-sink table against the batch twin ``stream_tumbling`` with a
    declarative full-outer join. Emits one summary row; all_match=True
    is the invariant (also asserted in test_streaming.py).

    Complete-output memory sink is a TEST sink: at production scale the
    same plan writes append-mode to Kafka/Delta with a tight watermark
    (bounded state), as documented on the helpers above."""
    import shutil
    import tempfile

    from .event_windows import stream_tumbling

    stage = tempfile.mkdtemp(prefix="stream_stage_")
    try:
        stage_events_stream(spark, sf_dir, stage, n_files=4)
        stream = read_events_stream(spark, stage)
        run_to_memory(
            spark,
            tumbling_counts_stream(stream),
            "stream_true_engine_out",
            mode="complete",
        )
        # memory sink rows are fully materialized in the session — the
        # staged source dir can go before the reconciliation runs
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    got = spark.table("stream_true_engine_out").select(
        "window_start",
        "event_type",
        F.col("n_events").alias("s_n"),
        F.col("total_value").alias("s_total"),
    )
    want = stream_tumbling(spark, sf_dir).select(
        "window_start",
        "event_type",
        F.col("n_events").alias("b_n"),
        F.col("total_value").alias("b_total"),
    )
    joined = got.join(want, ["window_start", "event_type"], "full_outer")
    row_ok = (
        F.col("s_n").isNotNull()
        & F.col("b_n").isNotNull()
        & (F.col("s_n") == F.col("b_n"))
        & (F.abs(F.col("s_total") - F.col("b_total")) < F.lit(1e-6))
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(F.col("s_n").isNotNull().cast("bigint")).alias("n_stream"),
        F.sum(F.col("b_n").isNotNull().cast("bigint")).alias("n_batch"),
        F.min(row_ok).alias("all_match"),
    )


@query(
    "stream_foreach_batch",
    # FULL oracle (r8 upgrade): the key-set reconciliation is
    # deterministic from events; the only engine-dependent figure (how
    # many micro-batches emitted rows) ships as the bounded boolean
    # multi_batch — 2..4 of the 4 staged files must contribute a
    # first-seen key, which every fixture SF satisfies (pytest has
    # pinned n_batches >= 2 since r6).
    oracle="""
        WITH k AS (
            SELECT CAST(count(*) AS BIGINT) AS n FROM (
                SELECT DISTINCT user_id, event_type FROM events))
        SELECT n AS n_keys, n AS n_stream_keys, n AS n_batch_keys,
               TRUE AS all_match, TRUE AS multi_batch
        FROM k
    """,
    phase="P4",
    # bench-skip: verification harness (staging write + 4 micro-batches +
    # parquet sink round-trip + reconciliation), not operator throughput
    tags=("streaming", "engine", "foreachbatch", "bench-skip"),
)
def stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink under the real engine, driver-visible: the
    watermarked streaming dedup (dropDuplicates over bounded state)
    drains through a foreachBatch writer that appends each micro-batch
    to a parquet sink with its batch_id stamped on every row — the
    idempotent multi-sink/upsert pattern production streams use when the
    target isn't a native sink. The written files are then read back and
    reconciled against the batch twin: exactly one emitted row per
    (user_id, event_type) key, and the streamed key set must equal the
    batch-distinct key set (full-outer join, no one-sided keys).

    Emits one summary row (all_match=True is the invariant, also
    asserted in test_streaming.py). At 100 TB the same foreachBatch fn
    writes Delta/Iceberg upserts; batch_id is the replay-idempotence
    token (a retried micro-batch overwrites, never double-appends)."""
    import shutil
    import tempfile

    stage = tempfile.mkdtemp(prefix="stream_fb_stage_")
    out = tempfile.mkdtemp(prefix="stream_fb_sink_")
    try:
        stage_events_stream(spark, sf_dir, stage, n_files=4)
        stream = read_events_stream(spark, stage)
        deduped = dedup_stream(stream, watermark="365 days").select(
            "user_id", "event_type", "event_id"
        )

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(out)

        run_foreach_batch(spark, deduped, sink, mode="append")
        # materialize before the sink dir vanishes
        got = spark.read.parquet(out).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
    per_key = got.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("s_n")
    )
    batch_keys = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .withColumn("b_seen", F.lit(1))
    )
    joined = per_key.join(batch_keys, ["user_id", "event_type"], "full_outer")
    key_ok = (
        F.col("s_n").isNotNull()
        & F.col("b_seen").isNotNull()
        & (F.col("s_n") == 1)
    )
    summary = joined.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.col("s_n").isNotNull().cast("bigint")).alias("n_stream_keys"),
        F.sum(F.col("b_seen").isNotNull().cast("bigint")).alias("n_batch_keys"),
        F.min(key_ok).alias("all_match"),
    )
    n_batches = got.agg(
        (
            F.countDistinct("batch_id").between(2, 4)
        ).alias("multi_batch")
    )
    return summary.crossJoin(n_batches)


@query(
    "stream_stream_join",
    # FULL oracle (r8 upgrade): n_pairs is the deterministic batch
    # range-join cardinality; a one-sided pair or dropped cross-batch
    # join row now hash-REDs instead of passing rows>0.
    oracle="""
        WITH c AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS cts
            FROM events WHERE event_type = 'click'
        ), p AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS pts
            FROM events WHERE event_type = 'purchase'
        ), j AS (
            SELECT CAST(count(*) AS BIGINT) AS n
            FROM c JOIN p ON c.user_id = p.user_id
             AND p.pts > c.cts
             AND p.pts <= c.cts + INTERVAL 24 HOURS
        )
        SELECT n AS n_pairs, n AS n_stream, n AS n_batch,
               TRUE AS all_match
        FROM j
    """,
    phase="P4",
    # bench-skip: verification harness (staging + engine + twin + join)
    tags=("streaming", "engine", "join", "bench-skip"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM join under the real engine, driver-visible:
    clicks⋈purchases within 24 h (``click_purchase_join_stream``, both
    sides watermarked — the join condition is the state-retention
    contract) drained with availableNow into a memory sink, then
    reconciled pair-for-pair against the equivalent batch range join
    (full-outer on the event-id pair; no one-sided rows). The staged
    4-file source arrives in event-time-unordered micro-batches, so
    this exercises cross-batch join state, not a single-batch join;
    the test watermark spans the data so the result is exact.

    Emits one summary row; all_match=True is the invariant (also
    asserted in test_streaming.py). Production uses a tight watermark
    and accepts bounded late-drop — documented on the helper."""
    import shutil
    import tempfile

    stage = tempfile.mkdtemp(prefix="stream_ssj_stage_")
    try:
        stage_events_stream(spark, sf_dir, stage, n_files=4)
        stream = read_events_stream(spark, stage)
        run_to_memory(
            spark,
            click_purchase_join_stream(stream, watermark="365 days"),
            "stream_ssj_out",
            mode="append",
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    got = spark.table("stream_ssj_out").select(
        "click_id", "purchase_id", F.lit(1).alias("s_seen")
    )
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 24 HOURS")
        ),
    ).select("click_id", "purchase_id", F.lit(1).alias("b_seen"))
    joined = got.join(want, ["click_id", "purchase_id"], "full_outer")
    pair_ok = F.col("s_seen").isNotNull() & F.col("b_seen").isNotNull()
    return joined.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("s_seen").isNotNull().cast("bigint")).alias("n_stream"),
        F.sum(F.col("b_seen").isNotNull().cast("bigint")).alias("n_batch"),
        F.min(pair_ok).alias("all_match"),
    )


@query(
    "stream_stateful_totals",
    # FULL oracle (r8 upgrade): the user-set reconciliation is
    # deterministic — per-user state must accumulate to the batch
    # groupBy, so n_users = |distinct user_id| and all_match TRUE.
    oracle="""
        WITH u AS (
            SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n
            FROM events)
        SELECT n AS n_users, n AS n_stream, n AS n_batch,
               TRUE AS all_match
        FROM u
    """,
    phase="P4",
    # bench-skip: verification harness (staging + 4 micro-batches of
    # Arrow state updates + batch twin + reconciliation)
    tags=("streaming", "engine", "stateful", "bench-skip"),
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM STATEFUL operator under the real engine, driver-visible:
    ``stateful_user_totals`` (applyInPandasWithState — per-user running
    count/sum/last-seen carried in the state store across micro-batches)
    drained in update mode, then the FINAL emitted row per user (the one
    with the highest running count) reconciled against the batch groupBy
    twin: same user set, same counts, totals within 1e-6.

    This is the escape-hatch surface for stateful logic windowed aggs
    can't express; the harness proves state actually accumulates across
    the 4 unordered micro-batches rather than resetting per batch.
    Emits one summary row; all_match=True is the invariant (also
    asserted in test_streaming.py)."""
    import shutil
    import tempfile

    stage = tempfile.mkdtemp(prefix="stream_state_stage_")
    try:
        stage_events_stream(spark, sf_dir, stage, n_files=4)
        stream = read_events_stream(spark, stage)
        run_to_memory(
            spark,
            stateful_user_totals(stream),
            "stream_stateful_out",
            mode="update",
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    got = (
        spark.table("stream_stateful_out")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("n_events").alias("s_n"),
            F.col("total_value").alias("s_total"),
        )
    )
    want = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("b_n"),
            F.sum("value").alias("b_total"),
        )
    )
    joined = got.join(want, "user_id", "full_outer")
    user_ok = (
        F.col("s_n").isNotNull()
        & F.col("b_n").isNotNull()
        & (F.col("s_n") == F.col("b_n"))
        & (F.abs(F.col("s_total") - F.col("b_total")) < F.lit(1e-6))
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("s_n").isNotNull().cast("bigint")).alias("n_stream"),
        F.sum(F.col("b_n").isNotNull().cast("bigint")).alias("n_batch"),
        F.min(user_ok).alias("all_match"),
    )


@query(
    "stream_session_true",
    # FULL oracle (r8 upgrade): the session count under the 30-minute
    # µs-grain gap rule is deterministic (ties in ts can't flip is_new:
    # a 0 gap is always <= 1800 s), so n_sessions = Σ is_new and
    # all_match TRUE — any session_window state-merge divergence from
    # the batch gap-and-cumsum twin now hash-REDs. The twin stays at µs
    # grain (registered batch stream_session truncates gaps to whole
    # seconds — the grain session_window actually merges at is µs).
    oracle="""
        WITH t AS (
            SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM events
        ), m AS (
            SELECT CASE WHEN lag(us) OVER w IS NULL
                          OR us - lag(us) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM t
            WINDOW w AS (PARTITION BY user_id ORDER BY us)
        )
        SELECT CAST(sum(is_new) AS BIGINT) AS n_sessions,
               CAST(sum(is_new) AS BIGINT) AS n_stream,
               CAST(sum(is_new) AS BIGINT) AS n_batch,
               TRUE AS all_match
        FROM m
    """,
    phase="P4",
    # bench-skip: verification harness (staging write + 4 micro-batches
    # + batch twin + reconciliation), not operator throughput
    tags=("streaming", "engine", "session", "bench-skip"),
)
def stream_session_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows under the real engine, driver-visible:
    readStream → watermark → F.session_window (the stateful operator
    that MERGES overlapping per-key sessions in the state store as
    events arrive across micro-batches) → complete-mode memory sink,
    reconciled session-by-session against the batch gap-and-cumsum
    construction. Checks per (user_id, session_start): event count,
    value total, and that the streaming session end equals the batch
    last-event ts + the 30-minute gap (session_window's end is
    last_ts + gap by definition).

    Session state is keyed on user_id — at 100 TB the state store
    shards by key across executors and the watermark bounds retained
    sessions, exactly like the tumbling-window case. all_match=True is
    the invariant (also asserted in test_streaming.py)."""
    import shutil
    import tempfile

    stage = tempfile.mkdtemp(prefix="stream_sess_stage_")
    try:
        stage_events_stream(spark, sf_dir, stage, n_files=4)
        stream = read_events_stream(spark, stage)
        run_to_memory(
            spark,
            sessionized_stream(stream, gap="30 minutes", watermark="365 days"),
            "stream_session_true_out",
            mode="complete",
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    got = spark.table("stream_session_true_out").select(
        "user_id",
        F.col("session_start"),
        F.col("session_end").alias("s_end"),
        F.col("n_events").alias("s_n"),
        F.col("total_value").alias("s_total"),
    )
    # µs-precision batch twin (session_window merges at full timestamp
    # grain; a whole-second gap comparison would disagree on gaps in
    # (1800, 1801) s)
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_us = F.lag(F.unix_micros("ts")).over(w_order)
    is_new = (
        prev_us.isNull()
        | (F.unix_micros("ts") - prev_us > F.lit(1800 * 1000000))
    ).cast("int")
    want = (
        e.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(w_run))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("b_last_ts"),
            F.count(F.lit(1)).alias("b_n"),
            F.sum("value").alias("b_total"),
        )
        .drop("session_id")
    )
    joined = got.join(want, ["user_id", "session_start"], "full_outer")
    row_ok = (
        F.col("s_n").isNotNull()
        & F.col("b_n").isNotNull()
        & (F.col("s_n") == F.col("b_n"))
        & (F.abs(F.col("s_total") - F.col("b_total")) < F.lit(1e-6))
        & (
            F.unix_micros("s_end")
            == F.unix_micros("b_last_ts") + F.lit(1800 * 1000000)
        )
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.col("s_n").isNotNull().cast("bigint")).alias("n_stream"),
        F.sum(F.col("b_n").isNotNull().cast("bigint")).alias("n_batch"),
        F.min(row_ok).alias("all_match"),
    )
