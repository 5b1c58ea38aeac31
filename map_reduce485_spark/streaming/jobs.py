"""Structured Streaming jobs over the events stream.

The batch twins of these operators live in
`map_reduce485_spark.queries.events_batch` and are DuckDB-oracle-checked;
`F.window` / `F.session_window` / `dropDuplicates` are engine-identical in
both modes, so the batch oracle transfers to the streaming plan.  Tests
replay the events parquet through a file-source stream with
`trigger(availableNow=True)` and assert streaming output == batch output.

Scale design: watermarks bound state (late data beyond 1 hour is dropped —
the knob a 100 TB/day pipeline needs to keep window state finite);
aggregation state is partitioned by (window, keys) across executors;
`availableNow` triggers give incremental backfill over historical data with
the same code path as live ingestion.

The reference has no streaming mode at all (SURVEY.md §1.3: batch only,
no watermark, no event-time) — this module is north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of events (parquet files appearing in a directory —
    the standard landing-zone ingestion pattern; swap for Kafka in prod
    with the same downstream code).  `max_files_per_trigger` throttles each
    micro-batch (None = everything available at once) — set it to exercise
    genuinely incremental multi-batch processing over a static landing dir."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def stream_tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour windowed aggregation with a late-data watermark.

    State per (window): count, exact decimal sum.  The watermark lets Spark
    drop window state once event time passes window_end + 1 h — bounded
    memory at any throughput."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def stream_sliding_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Sliding windows (2 h length, 1 h slide) per event type — the
    streaming twin of `events_sliding_window`.  Each event updates exactly
    2 overlapping windows; state per (window, event_type) is GC'd once the
    watermark passes window_end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def stream_sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows (30-min inactivity gap) — Spark's native
    stateful session operator; sessions merge as events arrive and close
    when the watermark passes last_event + gap."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("_first"), F.max("ts").alias("_last"))
        .select(
            "user_id",
            F.date_format(F.col("_first"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("_last"), "yyyy-MM-dd HH:mm:ss").alias("session_last"),
            "n_events",
        )
    )


def stream_dedup_exact(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the streaming twin of `dedup_exact`: state is a set of seen keys,
    GC'd by watermark (the only way dedup state stays bounded at 100 TB)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id", "ts"])


def stream_user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via `applyInPandasWithState`: per-user
    lifetime event count + exact value total, updated every micro-batch.

    This is the escape hatch for stateful logic Spark's built-in windowed
    aggs can't express (cross-batch counters, custom session logic, model
    state).  State lives partitioned by key in the state store; the Python
    function sees Arrow batches per key — never per-row Python.  The
    reference's closest analog is the reducer's per-key streaming fold
    (worker/__main__.py:194-202), which only works within one batch job.

    Only (user_id, value) cross the Arrow boundary — the update function
    reads nothing else, and Spark cannot see inside it, so an explicit
    select is what keeps the per-batch transfer narrow (guide §4.1: an
    opaque function over all columns ships all columns; round-14 plan audit
    found the full 6-column row — `props` included, a string blob — crossing
    per event)."""
    import pandas as pd  # noqa: F401  (needed on executors)

    events = events.select("user_id", "value")

    def update(key, pdf_iter, state):
        import pandas as pd

        total_n, total_v, n_updates = state.get if state.exists else (0, 0, 0)
        for pdf in pdf_iter:
            total_n += len(pdf)
            # per-row cents then integer sum — exact regardless of batch order
            total_v += int((pdf["value"] * 100).round().astype("int64").sum())
        # n_updates is a per-key STRICTLY increasing emission counter: the
        # highest-counter row is the final state by construction, with no
        # assumption that the data columns themselves are monotone (event
        # values could be negative and max(total_value_cents) would then
        # pick a non-final intermediate state).
        n_updates += 1
        state.update((total_n, total_v, n_updates))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "total_events": [total_n],
                "total_value_cents": [total_v],
                "n_updates": [n_updates],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id bigint, total_events bigint, total_value_cents bigint,"
            " n_updates bigint"
        ),
        stateStructType="total_n bigint, total_v bigint, n_updates bigint",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def stream_session_ttl(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows via CUSTOM state with TIMEOUT-DRIVEN EVICTION — the
    one standard stateful-streaming shape `session_window` can't express
    when you need your own session payload: `applyInPandasWithState` with
    ``EventTimeTimeout``.

    Each user's state buffers that user's event times (bounded in
    production by the watermark horizon — late events beyond it are
    dropped at the operator input).  NOTHING is emitted on data arrival;
    when the event-time watermark passes ``last_buffered + gap`` the state
    TIMES OUT, the update function runs with ``state.hasTimedOut`` and no
    input rows, and only then are the closed sessions sessionized from the
    buffer, emitted, and their events evicted.  Open-tail events (whose
    session the watermark cannot prove closed) stay in state with a fresh
    timeout deadline.  That is exactly `session_window`'s append-mode
    lifecycle, re-expressed over user-controlled state — the template for
    custom session payloads (funnels, per-session models).

    Output rows are a pure function of each user's event multiset and the
    gap — independent of how the file source batches arrivals — so the
    result is hash-checkable against the batch gaps-and-islands oracle.
    Buffered times are epoch MICROseconds: exact for parquet micro
    timestamps, so gap comparisons match the oracle's full-precision
    interval arithmetic."""
    import pandas as pd  # noqa: F401  (needed on executors)

    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)

    def update(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        buffered = np.array(state.get[0], dtype=np.int64) if state.exists else np.array([], dtype=np.int64)
        new = [
            pdf["ts"].astype("int64").to_numpy() // 1000  # ns -> us
            for pdf in pdf_iter
            if len(pdf)
        ]
        if new:
            buffered = np.sort(np.concatenate([buffered] + new))
        wm_ms = state.getCurrentWatermarkMs()

        out = []
        if state.hasTimedOut and len(buffered):
            # close every session the watermark has passed: break the
            # sorted buffer at > gap silences, emit prefixes whose
            # last + gap <= watermark, retain the open tail
            breaks = np.nonzero(np.diff(buffered) > gap_us)[0] + 1
            bounds = [0, *breaks.tolist(), len(buffered)]
            keep_from = len(buffered)
            for s, e in zip(bounds, bounds[1:]):
                if (buffered[e - 1] + gap_us) // 1000 <= wm_ms:
                    out.append((buffered[s], buffered[e - 1], e - s))
                else:
                    keep_from = s
                    break
            buffered = buffered[keep_from:]

        if len(buffered):
            state.update((buffered.tolist(),))
            deadline_ms = (int(buffered[-1]) + gap_us) // 1000 + 1
            state.setTimeoutTimestamp(max(deadline_ms, wm_ms + 1))
        else:
            state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out),
                "session_start_us": [o[0] for o in out],
                "session_last_us": [o[1] for o in out],
                "n_events": [o[2] for o in out],
            }
        )

    closed = (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id bigint, session_start_us bigint,"
                " session_last_us bigint, n_events bigint"
            ),
            stateStructType="ts_list array<bigint>",
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
    return closed.select(
        "user_id",
        F.date_format(
            F.timestamp_micros(F.col("session_start_us")), "yyyy-MM-dd HH:mm:ss"
        ).alias("session_start"),
        F.date_format(
            F.timestamp_micros(F.col("session_last_us")), "yyyy-MM-dd HH:mm:ss"
        ).alias("session_last"),
        "n_events",
    )


def stream_view_purchase_join(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each view joined to the same user's
    purchases within the next hour.

    The canonical attribution join.  Both sides carry watermarks and the
    join condition bounds purchase_ts to [view_ts, view_ts + horizon], so
    Spark can GC buffered rows once the watermark passes their join-window
    — state stays bounded at any throughput (unbounded-condition
    stream-stream joins are rejected by the engine for exactly this
    reason).  Batch twin: the same join expression on static DataFrames.
    """
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    joined = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")),
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "purchase_value",
    )


def stream_view_purchase_left_join(
    raw_views: DataFrame,
    raw_purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every view row emits exactly
    once — joined to each same-user purchase within the next ``horizon``,
    or with NULL purchase columns if none arrives before the watermark
    closes the view's join window.  The unmatched-row emission is the
    distinct stateful behavior vs the inner join
    (`stream_view_purchase_join`): the engine must HOLD each view in state
    past its window end and only then emit the null row, so results are
    watermark-driven, not arrival-driven.

    Takes the RAW streams (not pre-filtered), and the event-type filters
    deliberately let rows with user_id < 0 through on BOTH sides: those are
    out-of-band control rows (the far-future watermark sentinel in tests).
    They must reach the EventTimeWatermark operator to advance event time —
    a filter that drops them can be pushed below the watermark node, after
    which the join's state never sees the advanced watermark and unmatched
    rows never flush.  Callers drop `user_id < 0` rows from the OUTPUT.
    """
    v = (
        raw_views.withWatermark("ts", watermark)
        .filter((F.col("event_type") == "view") | (F.col("user_id") < 0))
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    p = (
        raw_purchases.withWatermark("ts", watermark)
        .filter((F.col("event_type") == "purchase") | (F.col("user_id") < 0))
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    joined = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")),
        "left_outer",
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "purchase_value",
    )


def _merge_swap_parquet(spark, base: str, first: DataFrame, merge) -> None:
    """Read-merge-swap a parquet state table (shared by the foreachBatch
    sinks): write `first` if `base` doesn't exist yet, else `merge(prev)` to
    a sibling ``.tmp`` dir (current state stays readable) and swap it in via
    two renames.  First-batch detection is an explicit Hadoop FS existence
    check (holds on HDFS/S3A), and an interrupted swap is rolled back from
    ``.old`` before merging — see `run_foreach_batch_upsert` for the full
    crash-safety story."""
    tmp_dir, old_dir = base + ".tmp", base + ".old"
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    state_p, tmp_p, old_p = hpath(base), hpath(tmp_dir), hpath(old_dir)
    fs = state_p.getFileSystem(spark._jsc.hadoopConfiguration())

    # roll back a swap interrupted between the two renames
    if not fs.exists(state_p) and fs.exists(old_p):
        fs.rename(old_p, state_p)

    if not fs.exists(state_p):  # genuinely the first batch
        first.write.mode("overwrite").parquet(base)
        return

    merge(spark.read.parquet(base)).write.mode("overwrite").parquet(tmp_dir)
    fs.delete(old_p, True)
    fs.rename(state_p, old_p)
    fs.rename(tmp_p, state_p)
    fs.delete(old_p, True)


def run_foreach_batch_upsert(
    events: DataFrame, state_dir: str, checkpoint_dir: str
):
    """Streaming upsert via foreachBatch: each micro-batch merges its
    latest-per-user records into a parquet state table (read-modify-write
    with latest-ts-wins).  This is the standard pattern for sinks without
    native MERGE — foreachBatch hands every micro-batch to arbitrary batch
    code under the streaming checkpoint's exactly-once batch ids.

    The merge never touches the driver: the new state is written to a
    sibling ``.tmp`` directory (the current state stays readable during the
    write), then swapped in with two filesystem renames — the same
    write-new-then-swap-pointer move a lakehouse MERGE commits with.  State
    size is bounded by distinct keys, but "bounded" at 100 TB is still far
    beyond driver memory, so no collect/createDataFrame round-trip anywhere.

    First-batch detection is an explicit FileSystem existence check (via the
    Hadoop FS API, so it holds on HDFS/S3A too) — NOT a bare try/except
    around the read, which would silently treat corrupt state or a transient
    FS error as "no state yet" and drop everything accumulated so far.

    Crash safety: if a batch dies between the two renames, the state dir is
    momentarily absent but the previous state survives under ``.old``; the
    next attempt (foreachBatch replays the failed batch id from the
    checkpoint) rolls it back before merging."""
    from pyspark.sql import Window as W

    base = state_dir.rstrip("/")

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        w = W.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        latest = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_id", "ts", "event_type", "value")
        )

        def merge(prev: DataFrame) -> DataFrame:
            return (
                prev.unionByName(latest)
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .drop("rn")
            )

        _merge_swap_parquet(spark, base, latest, merge)

    return (
        events.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_continuous_aggregate(
    events: DataFrame,
    agg_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
):
    """Hypertable-style CONTINUOUS AGGREGATE: an hourly rollup materialized
    as a parquet table and incrementally maintained as data arrives —
    the op TimescaleDB calls a continuous aggregate and lakehouses call
    incremental materialized-view refresh; Spark has no native analog, so
    it's composed here from update-mode windowed aggregation + a
    foreachBatch replace-by-key merge.

    Each micro-batch, the update-mode window agg emits ONLY the hour
    buckets that batch touched, each row carrying the bucket's full
    recomputed aggregate (Spark's window state holds the running values);
    the sink then replaces exactly those buckets in the parquet table
    (anti-join on window_start + union, swapped in atomically via
    `_merge_swap_parquet`).  Refresh cost is therefore proportional to
    CHANGED buckets, not table size — the property that makes a 100 TB
    rollup maintainable.  Watermark bounds the window state exactly as in
    `stream_tumbling_counts`; sums are integer cents so every refresh is
    exact."""

    def refresh(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        changed = batch_df.select("window_start", "n_events", "sum_value_cents")

        def merge(prev: DataFrame) -> DataFrame:
            keep = prev.join(
                changed.select("window_start"), "window_start", "left_anti"
            )
            return keep.unionByName(changed)

        _merge_swap_parquet(spark, agg_dir.rstrip("/"), changed, merge)

    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "sum_value_cents",
        )
    )
    return (
        agg.writeStream.foreachBatch(refresh)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_to_memory_sink(stream_df: DataFrame, name: str, mode: str = "complete"):
    """Execute a streaming plan to completion over all currently-available
    input (availableNow trigger) into an in-memory table; returns the query
    handle after it drains.  Test/dev harness — prod uses parquet/Kafka
    sinks with checkpointing."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_dedup_within_watermark(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming dedup via `dropDuplicatesWithinWatermark` — unlike
    `dropDuplicates`, which must hold every seen key FOREVER to honor its
    contract, this variant only guarantees suppression of duplicates whose
    event times fall within the watermark delay of each other — which lets
    the engine EVICT seen-keys once the watermark passes them.  That is
    the production-correct dedup for at-least-once sources (re-deliveries
    arrive close in event time; unbounded key state does not survive
    100 TB/day).  Note `ts` is deliberately NOT part of the key here: the
    key is the event id alone, the shape where WithinWatermark semantics
    actually differ from exact dedup."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
