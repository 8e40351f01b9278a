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


def _lineage_extras(result, stage):
    return {
        r["part_key"]: r["rows_out"]
        for r in result.lineage.filter(f"stage = '{stage}'").collect()
        if r["part_key"] != "*"
    }


def test_incremental_resume_appended_file(spark, images_df, tmp_path):
    """The round-3 verdict's top gap: appending ONE input file to a
    checkpointed run must (a) produce clusters identical to a from-scratch
    run over the full input, (b) re-extract features ONLY for the new file's
    rows (per-row incremental, dupion vfs/entry.rs:173-198 semantics), and
    (c) reuse prior verify verdicts for pairs between unchanged rows."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    cfg = DedupConfig()

    base = images_df.limit(400)
    base.repartition(3).write.mode("overwrite").parquet(src)
    first = run_pipeline(
        spark, base, cfg, checkpoint_dir=ckpt, source_path=src
    )
    n_base = first.clusters.count()
    assert n_base == 400

    # append: 100 more rows as a NEW part file (existing files untouched)
    extra = images_df.subtract(base.select(*images_df.columns)).limit(100)
    extra.coalesce(1).write.mode("append").parquet(src)
    full = spark.read.parquet(src)

    second = run_pipeline(
        spark, full, cfg, checkpoint_dir=ckpt, source_path=src
    )
    resumed = _stage_resumed(second)
    assert not resumed["features"]  # rebuilt (incrementally), not resumed

    # (b) feature lineage: exactly the appended rows were recomputed
    feat_extras = _lineage_extras(second, "features")
    assert feat_extras == {"rows_reused": 400, "rows_recomputed": 100}

    # (c) verify lineage: prior verdicts reused for unchanged-content pairs;
    # every pair touching a new row is freshly verified
    verify_extras = _lineage_extras(second, "verified_edges")
    assert verify_extras["pairs_reused"] > 0
    new_ids = {r["image_id"] for r in extra.select("image_id").collect()}
    touching_new = sum(
        1
        for r in second.candidate_pairs.select("id_l", "id_r").collect()
        if r["id_l"] in new_ids or r["id_r"] in new_ids
    )
    assert verify_extras["pairs_verified"] >= touching_new
    total_pairs = second.candidate_pairs.count()
    assert verify_extras["pairs_reused"] + verify_extras["pairs_verified"] == total_pairs

    # (a) clusters identical to a from-scratch run over the full input
    scratch = run_pipeline(spark, full, cfg, source_path=src)
    inc = sorted((r["image_id"], r["cluster_root"])
                 for r in second.clusters.collect())
    ref = sorted((r["image_id"], r["cluster_root"])
                 for r in scratch.clusters.collect())
    assert inc == ref
    assert len(inc) == 500

    # a third run with nothing changed resumes every stage whole
    third = run_pipeline(spark, full, cfg, checkpoint_dir=ckpt, source_path=src)
    assert all(_stage_resumed(third).values()), _stage_resumed(third)


def test_incremental_resume_changed_file(spark, images_df, tmp_path):
    """A MODIFIED input file invalidates exactly its own rows: they are
    re-extracted (new content) while other files' rows are reused."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    cfg = DedupConfig()

    images_df.limit(300).repartition(3).write.mode("overwrite").parquet(src)
    run_pipeline(spark, spark.read.parquet(src), cfg,
                 checkpoint_dir=ckpt, source_path=src)

    # touch one part file: content-identical but (size,mtime) fingerprint
    # changes -> the file counts as modified, its rows recompute
    part = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))[0]
    os.utime(os.path.join(src, part))
    changed_rows = spark.read.parquet(os.path.join(src, part)).count()

    second = run_pipeline(spark, spark.read.parquet(src), cfg,
                          checkpoint_dir=ckpt, source_path=src)
    feat_extras = _lineage_extras(second, "features")
    assert feat_extras["rows_recomputed"] == changed_rows
    assert feat_extras["rows_reused"] == 300 - changed_rows
