"""Structured Streaming surface (SURVEY §2.7 T1-T3, T6).

The reference is batch-shaped-like-a-stream: unbounded pagination with an
EOF sentinel and a checkpointed-by-convention watermark (SURVEY §1.3).
These factories give the same semantics the native Spark way:

* file-source stream with an explicit schema = the lake as an unbounded
  source (checkpointed offsets replace the max-landed-date resume,
  reference src/utils/gcs_helper.py:203-241);
* withWatermark + tumbling/sliding windows = the daily fetch slices
  (reference src/config/endpoints.py:27-34) generalized to any grain with
  late-data bounds;
* session_window = T6 sessionization (batch twin: queries/events.py
  events_sessionize);
* dropDuplicatesWithinWatermark = stateful streaming dedup (A4 on streams).

Every transformation here is also valid on a batch DataFrame — the
functions take "a DataFrame of events" and don't care which; tests verify
streaming output == the batch oracle queries on the same data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
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


# Microsecond-precision timestamp format for NDJSON round-trips (Spark's
# default JSON writer emits millis only, silently truncating event times).
TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def events_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Unbounded file source over an events directory (json only; the lake
    format). Rate limiting via maxFilesPerTrigger is the reference's
    inter-page pacing (T5, src/main.py:86) expressed as source throttling."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).option("timestampFormat", TS_FORMAT)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def stream_tumbling_counts(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Tumbling 1-day windowed counts with late-data watermark (T2+T1)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(F.col("window.start").alias("window_start"), "n_events", "approx_users")
    )


def stream_sliding_counts(
    events: DataFrame, length: str = "2 hours", slide: str = "1 hour",
    watermark: str = "1 day",
) -> DataFrame:
    """Sliding windows (T6)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", length, slide))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )


def stream_session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 day"
) -> DataFrame:
    """Native session windows per user (T6): 30-minute inactivity gap —
    the streaming twin of queries/events.py events_sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Stateful exact dedup on event_id within the watermark horizon —
    dropDuplicatesWithinWatermark bounds state (unbounded dedup state is the
    classic streaming OOM at scale)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def start_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Run a streaming query to completion over available data (availableNow
    trigger) into an in-memory table — the test/verification harness path.
    Returns the StreamingQuery; caller awaits termination then reads
    ``spark.table(name)``."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def start_to_lake(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    dedup_keys: list[str] | None = None,
    order_col: str = "ts",
    partition_cols: tuple[str, ...] = ("ds",),
):
    """Stream -> warehouse sink via foreachBatch + the batch refresh path
    (the production pattern: one code path for batch backfill AND streaming
    upkeep, per-partition idempotent).

    Each micro-batch derives its `ds` partitions and runs the SAME
    dynamic-partition-overwrite refresh the batch pipeline uses
    (pipeline/lake.py:refresh_table) — but partitioned on
    (*partition_cols, __sb=batch_id), NOT on ds alone. The batch id is
    load-bearing: two micro-batches of one stream can land rows for the
    SAME day, and a ds-keyed overwrite would have batch N wipe batch
    N-1's rows for that day (cross-batch data loss). Keyed on (ds, __sb),
    a REPLAYED micro-batch (checkpoint loss, at-least-once source —
    foreachBatch re-delivers the same batch_id) overwrites exactly its own
    partitions with identical content, while distinct batches never touch
    each other — Spark's exactly-once sink contract rebuilt from an
    idempotent writer (the reference's truncate-reload,
    src/utils/bigquery_helper.py:120, done per-partition). Readers treat
    __sb as an opaque layout column (prune it or dedup across it).

    Watermark-less by design: day partitions are closed by the overwrite
    being keyed on (ds, batch), not by event-time completion.
    """
    from ..pipeline.lake import refresh_table

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        staged = (
            batch_df.withColumn("ds", F.to_date("ts").cast("string"))
            .withColumn("__sb", F.lit(int(batch_id)))
        )
        refresh_table(
            staged,
            table_path,
            dedup_keys=dedup_keys,
            order_col=order_col,
            partition_cols=(*partition_cols, "__sb"),
        )

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
