"""Checkpoint/resume semantics (reference S8/F5: dupion's cache with
(ctime,size) validation, vfs/deser.rs:232-275 + vfs/entry.rs:173-198).

Proves the three contract points:
  1. a re-run with identical config AND identical input resumes every stage;
  2. changed INPUT invalidates the whole chain (root input fingerprint);
  3. an unknown parent name is an error, not a silently weaker chain.
"""

from __future__ import annotations

import os

import pytest

from dupion_spark.config import DedupConfig
from dupion_spark.pipeline import run_pipeline
from dupion_spark.sources.checkpoint import CheckpointManager, fingerprint_files


@pytest.fixture(scope="module")
def small_source(spark, images_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("resume") / "images_src")
    images_df.limit(150).coalesce(2).write.mode("overwrite").parquet(path)
    return path


def _stage_resumed(result) -> dict[str, bool]:
    return {s: v["resumed"] for s, v in result.metrics["stages"].items()}


def test_resume_reuses_then_invalidates_on_input_change(spark, small_source, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    images = spark.read.parquet(small_source)
    cfg = DedupConfig()

    first = run_pipeline(spark, images, cfg, checkpoint_dir=ckpt, source_path=small_source)
    assert not any(_stage_resumed(first).values())
    baseline = sorted((r["image_id"], r["cluster_root"]) for r in first.clusters.collect())

    second = run_pipeline(spark, images, cfg, checkpoint_dir=ckpt, source_path=small_source)
    assert all(_stage_resumed(second).values()), _stage_resumed(second)
    again = sorted((r["image_id"], r["cluster_root"]) for r in second.clusters.collect())
    assert again == baseline

    # touch one input file: the root fingerprint changes -> nothing is reused
    part = sorted(
        f for f in os.listdir(small_source) if f.endswith(".parquet")
    )[0]
    os.utime(os.path.join(small_source, part))
    third = run_pipeline(spark, images, cfg, checkpoint_dir=ckpt, source_path=small_source)
    assert not any(_stage_resumed(third).values()), _stage_resumed(third)


def test_config_change_invalidates_chain(spark, small_source, tmp_path):
    ckpt = str(tmp_path / "ckpt_cfg")
    images = spark.read.parquet(small_source)
    run_pipeline(spark, images, DedupConfig(), checkpoint_dir=ckpt, source_path=small_source)
    changed = run_pipeline(
        spark, images, DedupConfig(psnr_threshold_db=35.0),
        checkpoint_dir=ckpt, source_path=small_source,
    )
    assert not any(_stage_resumed(changed).values())


def test_fingerprint_tracks_file_changes(small_source):
    fp1 = fingerprint_files(small_source)
    assert fp1 == fingerprint_files(small_source)
    part = sorted(f for f in os.listdir(small_source) if f.endswith(".parquet"))[0]
    os.utime(os.path.join(small_source, part))
    assert fingerprint_files(small_source) != fp1


def test_unknown_parent_raises(spark, tmp_path):
    mgr = CheckpointManager(spark, str(tmp_path / "c"), DedupConfig())
    with pytest.raises(ValueError, match="unknown parent"):
        mgr.stage("child", lambda: spark.range(1), parents=["nope"])
