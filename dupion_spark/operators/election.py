"""Canonical ("senpai") election per cluster + export ordering.

- election (reference O6, dupion/src/dedup/mod.rs:60-79): dupion elects the
  group representative by argmin over (n_extents ASC, phys_occurrences DESC,
  ctime ASC, |phys - avg_phys| ASC). The graft's analog ordering elects the
  canonical image per cluster by
      (byte_len ASC,        # least storage, ~ least-fragmented
       exact_copies DESC,   # the most-replicated encoding wins ties
       image_id ASC)        # deterministic final tiebreak
  as a row_number window, filter rn = 1.

- export ordering (reference O2, dupion/src/process/mod.rs:8-33): groups
  sorted by (size DESC, first-member path ASC); members within a group sorted
  lexicographically (sort_array on the collected list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def canonical_map(clusters: DataFrame, hashes: DataFrame) -> DataFrame:
    """clusters(image_id, cluster_root) x hashes -> one row per cluster:
    (cluster_root, canonical_image_id, n_members, total_bytes)."""
    exact_counts = Window.partitionBy("pixel_sha256")
    enriched = (
        clusters.join(hashes.select("image_id", "byte_len", "pixel_sha256"), "image_id")
        .withColumn(
            "exact_copies",
            F.when(
                F.col("pixel_sha256").isNotNull(), F.count(F.lit(1)).over(exact_counts)
            ).otherwise(F.lit(1)),
        )
    )
    elect = Window.partitionBy("cluster_root").orderBy(
        F.col("byte_len").asc(),
        F.col("exact_copies").desc(),
        F.col("image_id").asc(),
    )
    stats = Window.partitionBy("cluster_root")
    return (
        enriched.withColumn("_rn", F.row_number().over(elect))
        .withColumn("n_members", F.count(F.lit(1)).over(stats))
        .withColumn("total_bytes", F.sum("byte_len").over(stats))
        .filter(F.col("_rn") == 1)
        .select(
            "cluster_root",
            F.col("image_id").alias("canonical_image_id"),
            "n_members",
            "total_bytes",
        )
    )


def export_groups(clusters: DataFrame, hashes: DataFrame) -> DataFrame:
    """Multi-member clusters in dupion's export order (O2): biggest first,
    then first-member id; members sorted within the group."""
    grouped = (
        clusters.join(hashes.select("image_id", "byte_len"), "image_id")
        .groupBy("cluster_root")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("byte_len").alias("total_bytes"),
            F.sort_array(F.collect_list("image_id")).alias("members"),
        )
        .filter(F.col("n_members") > 1)
    )
    return grouped.orderBy(
        F.col("total_bytes").desc(), F.col("members").getItem(0).asc()
    )
