"""Streaming exact-dedup: incremental ingest of image rows.

Pipeline shape:
    readStream(parquet dir, input_hint schema)
      -> byte_sha256 (JVM-side, whole-stage codegen)
      -> watermark + dropDuplicates on content hash   (streaming state store)
      -> writeStream(append, parquet) with checkpointLocation

dropDuplicatesWithinWatermark bounds the state store: byte-identical rows
arriving within the watermark window are suppressed; exact dedup across the
full corpus remains the batch pipeline's job (operators/exact). This mirrors
dupion's incremental cache semantics (vfs/deser.rs:232-275): cheap incremental
suppression now, authoritative recompute on schedule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)


def read_image_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of image rows (new parquet files under input_dir)."""
    return (
        spark.readStream.schema(IMAGE_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def dedup_transform(
    stream: DataFrame,
    event_time_col: str | None = None,
    watermark: str = "1 minute",
) -> DataFrame:
    """Content-hash + event-time columns, then streaming duplicate drop.

    event_time_col: a timestamp column in the stream to watermark on (real
    deployments carry an ingest ts in the table; late duplicates are
    suppressed/admitted relative to IT, deterministically). When absent —
    auto-detected if the stream has an `ingest_ts` column — the processing
    timestamp stands in, keeping state bounded but making suppression depend
    on arrival time (the driver fixture has no ts column)."""
    if event_time_col is None and "ingest_ts" in stream.columns:
        event_time_col = "ingest_ts"
    hashed = stream.withColumn("byte_sha256", F.sha2(F.col("bytes"), 256))
    if event_time_col is None:
        hashed = hashed.withColumn("ingest_ts", F.current_timestamp())
        event_time_col = "ingest_ts"
    elif event_time_col != "ingest_ts":
        hashed = hashed.withColumn("ingest_ts", F.col(event_time_col))
    return hashed.withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark(
        ["byte_sha256"]
    )


# tumbling-window width for the event-table dedup: the batch-equivalent's
# window plays the role the watermark delay plays in dropDuplicatesWithinWatermark
# (how long a first sighting suppresses duplicates), made deterministic by
# anchoring to EVENT time instead of state-arrival time
STREAM_DEDUP_WINDOW_SEC = 600


def windowed_first_events(
    events: DataFrame,
    window_sec: int = STREAM_DEDUP_WINDOW_SEC,
    watermark: str | None = None,
) -> DataFrame:
    """First event per (user_id, event_type) in each event-time tumbling
    window — the DETERMINISTIC batch-equivalent of watermarked streaming
    dedup, and the form that gives the streaming operator a SQL-checkable
    CORRECTNESS row (dropDuplicatesWithinWatermark keeps whichever duplicate
    ARRIVES first, which no stateless oracle can replicate; anchoring the
    keep-decision to event time makes batch and stream agree row-for-row).

    Scale shape: min(struct(ts, event_id)) is map-side combinable, so the
    one shuffle carries a single row per (key, window) — never the event
    stream. The SAME plan runs as a Structured Streaming aggregation: pass
    watermark to bound state (tests assert batch == streamed availableNow
    output). Ties break to the lowest event_id."""
    # watermarks require a tz-aware TIMESTAMP event-time column; the events
    # table stores TIMESTAMP_NTZ. The cast interprets it in the session tz,
    # pinned UTC — the same instant DuckDB's epoch() assigns the naive value
    # — and is used only for windowing; the ORIGINAL ts rides through the
    # aggregate so the output schema matches the table's.
    df = events.withColumn("_evt", F.col("ts").cast("timestamp"))
    if watermark:
        df = df.withWatermark("_evt", watermark)
    return (
        df.groupBy(
            F.window("_evt", f"{window_sec} seconds").alias("win"),
            F.col("user_id"),
            F.col("event_type"),
        )
        .agg(F.min(F.struct("ts", "event_id")).alias("first"))
        .select(
            F.col("win.start").cast("long").alias("window_start_s"),
            "user_id",
            "event_type",
            F.col("first.event_id").alias("event_id"),
            F.col("first.ts").alias("ts"),
        )
    )


def run_stream(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str
):
    """Start the streaming dedup job (availableNow: drain-and-stop, the
    batch-friendly trigger used in tests and backfills)."""
    deduped = dedup_transform(read_image_stream(spark, input_dir))
    return (
        deduped.select(
            "image_id", "byte_sha256", "w", "h", "fmt", "caption", "phash"
        )
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
