"""Streaming event aggregation: watermarked windows, stream dedup,
stateful sessionization.

Design: each operator is a *transformation* on a (possibly streaming)
DataFrame — identical code path for batch and stream, the Structured
Streaming model. Helpers run the streaming flavor to completion with
``Trigger.AvailableNow`` against the static events parquet and return the
result as a plain DataFrame, so the registry can diff it against a batch
SQL oracle (exact parity is the correctness story; real deployments swap
the source for Kafka/files and keep the query).
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_event_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour event counts + value sum per event_type, tolerating
    ``watermark`` of lateness. Works on a static OR streaming DataFrame —
    with AvailableNow over static input the watermark never drops rows, so
    output equals the batch GROUP BY (the oracle)."""
    src = events
    if events.isStreaming:
        # parquet timestamps decode as TIMESTAMP_NTZ; watermarks require an
        # instant type — session tz is pinned UTC so the cast is lossless
        src = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", watermark
        )
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event ids within the watermark horizon:
    ``dropDuplicates`` keyed on event_id — the streaming analog of exact
    dedup (state bounded by the watermark on a real stream)."""
    if events.isStreaming:
        events = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", watermark
        )
    return events.dropDuplicates(["event_id"])


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based session windows per user.

    Streaming flavor: ``applyInPandasWithState``-class custom stateful
    logic; here expressed with the equivalent *deterministic batch
    semantics* via ``applyInPandas`` per user (sessions = maximal runs of
    events with inter-arrival gap <= gap_minutes). The batch-SQL oracle is
    the classic lag/gap-islands query, so parity is verifiable. On a live
    stream the same function body runs under
    ``applyInPandasWithState`` with a watermark-bounded state timeout.
    """
    gap = gap_minutes * 60

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts = pdf["ts"]
        new_session = (ts - ts.shift(1)).dt.total_seconds().fillna(gap + 1) > gap
        sid = new_session.cumsum()
        out = pdf.groupby(sid).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "count"),
            sum_value=("value", "sum"),
        )
        return out.reset_index(drop=True)

    return events.groupBy("user_id").applyInPandas(per_user, SESSION_SCHEMA)


def sessionize_stateful(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions as a REAL custom stateful streaming operator:
    ``applyInPandasWithState`` keeps one open session per user across
    triggers and emits a session the moment a later event (or the
    end-of-stream sentinel the harness appends) proves the gap elapsed.

    Semantics identical to the batch ``sessionize`` (gap-islands); the
    batch path falls through to it, so one function serves both — the
    Structured Streaming model. Per-trigger work stays vectorized: the
    island computation is the same pandas cumsum kernel, the state merge
    touches only the first/last island.

    State per user: (session_start_us, session_end_us, n_events,
    sum_value) epoch-microsecond tuple — O(1) per key, watermark-free
    (closure is data-driven), so state size is bounded by |active users|.
    """
    if not events.isStreaming:
        return sessionize(events, gap_minutes)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("end_us", LongType()),
            StructField("n", LongType()),
            StructField("v", DoubleType()),
        ]
    )

    def per_user_state(key, pdfs, state: GroupState):
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts = pd.to_datetime(pdf["ts"])
        if ts.dt.tz is not None:  # tz-aware under some Arrow configs
            ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
        us = ts.astype("datetime64[us]").astype("int64")  # epoch microseconds
        new_island = (us - us.shift(1)).fillna(gap_us + 1) > gap_us
        sid = new_island.cumsum()
        islands = (
            pdf.assign(_us=us, _sid=sid)
            .groupby("_sid")
            .agg(
                start_us=("_us", "min"),
                end_us=("_us", "max"),
                n=("event_id", "count"),
                v=("value", "sum"),
            )
            .reset_index(drop=True)
        )
        closed = []
        if state.exists:
            s0, e0, n0, v0 = state.get
            first = islands.iloc[0]
            if int(first["start_us"]) - e0 <= gap_us:
                islands.iloc[0, islands.columns.get_loc("start_us")] = min(s0, int(first["start_us"]))
                islands.iloc[0, islands.columns.get_loc("end_us")] = max(e0, int(first["end_us"]))
                islands.iloc[0, islands.columns.get_loc("n")] = n0 + int(first["n"])
                islands.iloc[0, islands.columns.get_loc("v")] = v0 + float(first["v"])
            else:
                closed.append((s0, e0, n0, v0))
        last = islands.iloc[-1]
        state.update((int(last["start_us"]), int(last["end_us"]), int(last["n"]), float(last["v"])))
        closed.extend(
            (int(r["start_us"]), int(r["end_us"]), int(r["n"]), float(r["v"]))
            for _, r in islands.iloc[:-1].iterrows()
        )
        if closed:
            out = pd.DataFrame(closed, columns=["start_us", "end_us", "n", "v"])
            yield pd.DataFrame(
                {
                    "user_id": key[0],
                    "session_start": pd.to_datetime(out["start_us"], unit="us"),
                    "session_end": pd.to_datetime(out["end_us"], unit="us"),
                    "n_events": out["n"],
                    "sum_value": out["v"],
                }
            )

    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return src.groupBy("user_id").applyInPandasWithState(
        per_user_state,
        outputStructType=SESSION_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_sessionize_stateful(
    spark: SparkSession, parquet_path: str, gap_minutes: int = 30
) -> DataFrame:
    """Batch-parity harness for the stateful sessionizer: stream the events
    file as trigger 1, then a sentinel event per user (ts far past every
    real session's gap) as trigger 2 so every real session is provably
    closed by DATA, not by end-of-stream truncation. Sentinel sessions are
    filtered out of the result; output therefore equals the batch
    gap-islands oracle exactly."""
    static = spark.read.parquet(parquet_path)
    bounds = static.agg(
        F.max(F.col("ts").cast("timestamp")).alias("mx")
    ).collect()[0]
    sentinel_ts = bounds["mx"] + pd.Timedelta(minutes=3 * gap_minutes)
    sentinels = (
        static.select("user_id").distinct()
        .select(
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(sentinel_ts).alias("ts"),
            "user_id",
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
        )
    )
    name = "s_" + uuid.uuid4().hex[:12]
    with tempfile.TemporaryDirectory() as workdir:
        src_dir = os.path.join(workdir, "in")
        os.makedirs(src_dir)
        os.symlink(os.path.abspath(parquet_path), os.path.join(src_dir, "part-0.parquet"))
        sent_dir = os.path.join(workdir, "sent")
        sentinels.coalesce(1).write.parquet(sent_dir)
        sent_file = next(
            f for f in os.listdir(sent_dir) if f.endswith(".parquet")
        )
        # the file source orders triggers by target-file mtime
        # (latestFirst=false): push the sentinel file far into the future so
        # the real events are always trigger 1, sentinels trigger 2
        import time as _time

        far = _time.time() + 3600
        os.utime(os.path.join(sent_dir, sent_file), (far, far))
        os.symlink(
            os.path.join(sent_dir, sent_file), os.path.join(src_dir, "part-1.parquet")
        )
        stream = (
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        q = (
            sessionize_stateful(stream, gap_minutes)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # drop the sentinel sessions (each is the lone sentinel event, if it
    # surfaced at all) — everything earlier is a real, data-closed session
    return spark.table(name).where(F.col("session_start") < F.lit(sentinel_ts))


def run_stream_to_df(
    spark: SparkSession,
    parquet_path: str,
    transform,
    output_mode: str = "append",
) -> DataFrame:
    """Run ``transform(stream_df)`` over the parquet file as a file-source
    stream with Trigger.AvailableNow into an in-memory sink; return the
    completed result as a DataFrame. This is the batch-parity harness the
    registry queries use."""
    static = spark.read.parquet(parquet_path)
    name = "s_" + uuid.uuid4().hex[:12]
    with tempfile.TemporaryDirectory() as workdir:
        # the file source requires a *directory*; testdata ships single
        # read-only files — symlink one in
        src_dir = os.path.join(workdir, "in")
        os.makedirs(src_dir)
        os.symlink(os.path.abspath(parquet_path), os.path.join(src_dir, "part-0.parquet"))
        stream = (
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        q = (
            transform(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def stream_stream_attribution(
    views: DataFrame,
    clicks: DataFrame,
    horizon_minutes: int = 360,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join with an event-time range condition: every
    (view, click) pair of the SAME user where the click lands within
    ``horizon_minutes`` after the view — the canonical attribution join,
    the one Structured Streaming surface the engine did not yet cover
    (stream-static enrich and windowed aggs are stateless/keyed; this one
    buffers BOTH sides).

    Semantics/state: both sides are watermarked and the join condition
    bounds click.ts to (view.ts, view.ts + horizon], so Spark derives a
    state-eviction bound on each side — per-key state is O(events within
    watermark + horizon), never the full history. With AvailableNow over a
    single static file everything arrives in one microbatch and the inner
    join emits exactly the batch join (the SQL oracle); on a real source
    the same query runs unbounded. The join itself shuffles both streams
    on user_id — the same equi-key hash exchange a batch join would use,
    so the plan scales like any keyed join (skewed hot users would salt
    exactly as the blocking self-join does).
    """
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").cast("timestamp").alias("v_ts"),
    )
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").cast("timestamp").alias("c_ts"),
        F.col("value").alias("click_value"),
    )
    if views.isStreaming:
        v = v.withWatermark("v_ts", watermark)
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", watermark)
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {int(horizon_minutes)} MINUTES"))
    )
    return v.join(c, cond, "inner").select(
        F.col("view_id"),
        F.col("click_id"),
        F.col("v_user").alias("user_id"),
        "click_value",
    )


def run_two_stream_to_df(
    spark: SparkSession,
    parquet_path: str,
    transform,
    output_mode: str = "append",
    state_partitions: int | None = 4,
) -> DataFrame:
    """Like :func:`run_stream_to_df` but hands ``transform`` TWO
    independent file-source streams over the same parquet file (each its
    own source with its own watermark), for stream-stream joins.

    ``state_partitions`` pins ``spark.sql.shuffle.partitions`` for the
    lifetime of the query START (streaming fixes its state-partition count
    at start; the conf is restored immediately after). A stream-stream
    join keeps FOUR state stores per partition, each committing checkpoint
    files every batch — measured 41 s at 32 partitions vs 3 s at 4 for the
    same 100k-event input — so state width must track expected state
    VOLUME, not session core count. A production job sizes this once for
    its throughput; it cannot be changed across restarts of the same
    checkpoint."""
    static = spark.read.parquet(parquet_path)
    name = "s_" + uuid.uuid4().hex[:12]
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    with tempfile.TemporaryDirectory() as workdir:
        src_dir = os.path.join(workdir, "in")
        os.makedirs(src_dir)
        os.symlink(os.path.abspath(parquet_path), os.path.join(src_dir, "part-0.parquet"))

        def mk_stream():
            return (
                spark.readStream.schema(static.schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src_dir)
            )

        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        try:
            q = (
                transform(mk_stream(), mk_stream())
                .writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .option("checkpointLocation", os.path.join(workdir, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
        finally:
            if state_partitions is not None:
                spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        q.awaitTermination()
    return spark.table(name)


def stream_static_enrich(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each (possibly streaming) event picks
    up its user's precomputed profile row — the canonical "dimension table
    beside a stream" pattern (stateless; no watermark needed because the
    static side never changes within a run).

    The profile columns are deliberately order-independent aggregates
    (count, max) so batch and stream runs — and the SQL oracle — agree
    bit-for-bit; ``is_user_max`` flags the event that attains its user's
    maximum value. On a cluster the static side is a broadcast by size;
    the hint is left to AQE because a 10^9-user profile table must
    shuffle-join instead."""
    e = events
    if events.isStreaming:
        e = e.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        e.join(user_dim, "user_id")
        .select(
            "event_id", "user_id", "event_type", "user_n", "vmax",
            (F.col("value") >= F.col("vmax")).cast("int").alias("is_user_max"),
        )
    )


def user_profile_dim(events_static: DataFrame) -> DataFrame:
    """(user_id, user_n, vmax): the static profile side for
    :func:`stream_static_enrich` — one partially-aggregated groupBy over
    the historical table."""
    return events_static.groupBy("user_id").agg(
        F.count("*").alias("user_n"), F.max("value").alias("vmax")
    )
