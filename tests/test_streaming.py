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
