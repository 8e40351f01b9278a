"""Image-pipeline queries for the driver contract (rows-only checks).

These run the actual near-duplicate engine on the deterministic synthetic
image+caption fixture (BASELINE.json input_hint shape; the driver's TPC-H-ish
tables carry no image payloads, and the task mandates synthesizing the input
table deterministically at small scale). The fixture is materialized once per
scale under data/ and reused.

No oracle_sql entries: pixel decode (pandas UDFs) and iterative connected
components are not SQL-expressible — the driver records rows-only checks
(__spark_entry__ contract), and pytest's golden-oracle recall gate covers
value correctness (tests/test_pipeline.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dupion_spark.config import DedupConfig
from dupion_spark.operators import exact
from dupion_spark.pipeline import run_pipeline
from dupion_spark.sources.synth import materialize

DATA_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")

# fixture rows per driver scale factor (sf_dir basename -> n_rows)
SCALE_ROWS = {"sf0.001": 300, "sf0.01": 1200, "sf0.1": 6000}


def _fixture_dir(sf_dir: str) -> tuple[str, int]:
    scale = os.path.basename(sf_dir.rstrip("/")) or "sf0.001"
    n_rows = SCALE_ROWS.get(scale, 300)
    out = os.path.join(DATA_ROOT, f"synth_{scale}")
    materialize(out, n_rows)
    return out, n_rows


def load_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    fdir, _ = _fixture_dir(sf_dir)
    return spark.read.parquet(os.path.join(fdir, "images.parquet"))


def load_partition_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    fdir, _ = _fixture_dir(sf_dir)
    return spark.read.parquet(os.path.join(fdir, "partition_map.parquet"))


def q_img_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate pixel groups (dupion's default output, SURVEY §3.1)."""
    images = load_images(spark, sf_dir)
    cfg = DedupConfig()
    hashes = exact.exact_hash_table(images, cfg)
    return exact.exact_groups(hashes).select(
        F.hex(F.col("pixel_sha256")).alias("pixel_hash"),
        "n_members",
        "total_bytes",
        F.col("members").getItem(0).alias("first_member"),
    )


def q_img_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup pipeline -> cluster assignments (image_id, cluster_root)."""
    images = load_images(spark, sf_dir)
    result = run_pipeline(spark, images, DedupConfig())
    return result.clusters


def q_img_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster canonical map via senpai election (O6 graft)."""
    images = load_images(spark, sf_dir)
    result = run_pipeline(spark, images, DedupConfig())
    return result.canonical


def q_img_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition rollup hashes + twin detection (A4/J3 graft)."""
    images = load_images(spark, sf_dir)
    parts = load_partition_map(spark, sf_dir)
    result = run_pipeline(spark, images, DedupConfig(), partition_map=parts)
    return result.rollup


def q_img_groups_shadow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 shadow-rule group output (groups.rs:4-56) over the image clusters:
    rule 2 (the reference default)."""
    from dupion_spark.operators.groups import groups_with_shadow_rule

    images = load_images(spark, sf_dir)
    parts = load_partition_map(spark, sf_dir)
    result = run_pipeline(spark, images, DedupConfig(), partition_map=parts)
    out = groups_with_shadow_rule(result.clusters, result.shadows, rule=2)
    return out.select(
        "cluster_root", "n_members", "n_shadowed", "n_visible",
        F.col("members").getItem(0).alias("first_member"),
    )


def q_img_treediff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 treediff (treediff.rs:96-131) between the two planted duplicate
    partitions dupA/dupB: every rel_name should classify as 2 (equal)."""
    from dupion_spark.operators import exact
    from dupion_spark.operators.treediff import diff_rows

    images = load_images(spark, sf_dir)
    parts = load_partition_map(spark, sf_dir)
    cfg = DedupConfig()
    hashes = exact.exact_hash_table(images, cfg)
    keyed = parts.join(hashes, "image_id").withColumn(
        "content_hash", F.coalesce(F.hex("pixel_sha256"), F.col("byte_sha256"))
    )
    side_a = keyed.filter(F.col("part_key") == "dupA")
    side_b = keyed.filter(F.col("part_key") == "dupB")
    return diff_rows(side_a, side_b)


def image_queries():
    return {
        "img_exact_groups": q_img_exact_groups,
        "img_clusters": q_img_clusters,
        "img_canonical": q_img_canonical,
        "img_rollup": q_img_rollup,
        "img_groups_shadow": q_img_groups_shadow,
        "img_treediff": q_img_treediff,
    }
