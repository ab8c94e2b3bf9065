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
