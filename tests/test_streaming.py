"""Structured Streaming exact-dedup: file-source ingest -> watermarked
dropDuplicates on the content hash -> parquet sink, availableNow trigger."""

import os

import pytest
from pyspark.sql import functions as F

from dupion_spark.streaming.dedup_stream import run_stream


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory, spark, fixture_small):
    base = tmp_path_factory.mktemp("stream")
    input_dir = str(base / "in")
    out_dir = str(base / "out")
    ckpt_dir = str(base / "ckpt")
    os.makedirs(input_dir)
    # two input files, the second partially overlapping (byte-identical rows)
    from dupion_spark.streaming.dedup_stream import IMAGE_SCHEMA

    images = fixture_small.images
    first = spark.createDataFrame(images.iloc[:200], schema=IMAGE_SCHEMA)
    second = spark.createDataFrame(images.iloc[150:300], schema=IMAGE_SCHEMA)
    first.coalesce(1).write.mode("append").parquet(input_dir)
    second.coalesce(1).write.mode("append").parquet(input_dir)
    return input_dir, out_dir, ckpt_dir


def test_streaming_dedup_drains_and_dedups(spark, stream_dirs, fixture_small):
    input_dir, out_dir, ckpt_dir = stream_dirs
    query = run_stream(spark, input_dir, out_dir, ckpt_dir)
    query.awaitTermination(timeout=300)
    out = spark.read.parquet(out_dir)
    # within-watermark duplicate suppression: every byte_sha256 appears once
    assert out.groupBy("byte_sha256").count().filter("count > 1").count() == 0
    # all distinct content of the 300-row window is represented
    distinct_blobs = fixture_small.images.iloc[:300]["bytes"].map(bytes).nunique()
    assert out.count() == distinct_blobs
    # restart with the same checkpoint: no new files -> no new rows
    query2 = run_stream(spark, input_dir, out_dir, ckpt_dir)
    query2.awaitTermination(timeout=120)
    assert spark.read.parquet(out_dir).count() == distinct_blobs


def test_event_time_watermark_suppresses_then_readmits(spark, tmp_path):
    """With an explicit event-time column, duplicate suppression is
    deterministic in EVENT time: a duplicate within the watermark window is
    dropped; once the watermark passes the first sighting's state expiry,
    the same content is re-admitted (state evicted). Three availableNow
    drains against one checkpoint = three ordered ingest rounds."""
    from pyspark.sql import types as T

    from dupion_spark.streaming.dedup_stream import IMAGE_SCHEMA, dedup_transform

    schema = T.StructType(
        IMAGE_SCHEMA.fields + [T.StructField("ingest_ts", T.TimestampType(), True)]
    )
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt_dir = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    def write_rows(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(input_dir)

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(input_dir)
        )
        q = (
            dedup_transform(stream, event_time_col="ingest_ts")
            .select("image_id", "byte_sha256", "ingest_ts")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(timeout=300)

    import datetime as dt

    def ts(minute, second=0):
        return dt.datetime(2026, 1, 1, 10, 0, 0) + dt.timedelta(
            minutes=minute, seconds=second
        )

    X, Z = b"payload-X", b"payload-Z"
    row = lambda i, b, t: (i, b, 1, 1, "png", "", 0, t)

    write_rows([row("a1", X, ts(0))])
    drain()  # watermark after round 1: 09:59 — X state live until 10:01
    write_rows([row("a2", X, ts(0, 30)),    # dup within watermark: suppressed
                row("c1", Z, ts(120))])     # advances watermark to 11:59
    drain()
    write_rows([row("a3", X, ts(121))])     # X state expired: re-admitted
    drain()

    out = {r["image_id"] for r in spark.read.parquet(out_dir).collect()}
    assert out == {"a1", "c1", "a3"}, out


def test_windowed_first_events_batch_equals_stream(spark, tmp_path):
    """The CORRECTNESS-row query (stream_dedup_batch_equiv) and the actual
    Structured Streaming aggregation it models must agree row-for-row: same
    windowed_first_events plan, batch vs readStream + availableNow drain."""
    import shutil

    from dupion_spark.streaming.dedup_stream import windowed_first_events

    src = "/root/testdata/sf0.001/events.parquet"
    in_dir = str(tmp_path / "events_in")
    os.makedirs(in_dir)
    shutil.copy(src, os.path.join(in_dir, "part-0.parquet"))

    events = spark.read.parquet(src)
    batch = sorted(tuple(r) for r in windowed_first_events(events).collect())
    assert batch, "empty batch result would make the equality vacuous"

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        windowed_first_events(stream, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("wfe_equiv")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM wfe_equiv").collect())
    assert got == batch
