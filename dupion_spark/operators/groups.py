"""Group output with dupion's shadow rules (reference P1).

dupion/src/output/groups.rs:4-56: a duplicate group is printed subject to
`shadow_rule`:
  rule 0 — show every group
  rule 1 — hide groups whose members are ALL shadowed
  rule 2 — (default) show shadowed members only when the count of
           non-shadowed members != 1; additionally skip the whole group when
           hiding shadowed leaves <= 1 visible member
  rule 3 — never count shadowed members; skip groups with <= 1 visible member

Expressed as window counts + conditional filters over the cluster table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def groups_with_shadow_rule(
    clusters: DataFrame, shadows: DataFrame, rule: int = 2
) -> DataFrame:
    """clusters(image_id, cluster_root) x shadows(image_id, shadowed) ->
    groups (cluster_root, n_members, n_shadowed, n_visible, members) filtered
    per the shadow rule. Members listed are the *visible* ones for rules 2-3
    when shadowed members are suppressed, mirroring groups.rs:28-38."""
    joined = clusters.join(shadows, "image_id", "left").withColumn(
        "shadowed", F.coalesce(F.col("shadowed"), F.lit(False))
    )
    grouped = joined.groupBy("cluster_root").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.col("shadowed").cast("int")).alias("n_shadowed"),
        F.sort_array(F.collect_list("image_id")).alias("all_members"),
        F.sort_array(
            F.collect_list(F.when(~F.col("shadowed"), F.col("image_id")))
        ).alias("visible_members"),
    ).withColumn("n_visible", F.col("n_members") - F.col("n_shadowed"))
    grouped = grouped.filter(F.col("n_members") > 1)

    if rule == 0:
        out = grouped.withColumn("members", F.col("all_members"))
    elif rule == 1:
        out = grouped.filter(F.col("n_visible") > 0).withColumn(
            "members", F.col("all_members")
        )
    elif rule == 2:
        # show shadowed members only when n_visible != 1; skip groups where
        # hiding shadowed leaves <=1 visible member
        out = grouped.filter(
            (F.col("n_visible") != 1) | (F.col("n_members") > 1)
        ).withColumn(
            "members",
            F.when(F.col("n_visible") != 1, F.col("all_members")).otherwise(
                F.col("visible_members")
            ),
        ).filter(F.size("members") > 1)
    elif rule == 3:
        out = grouped.filter(F.col("n_visible") > 1).withColumn(
            "members", F.col("visible_members")
        )
    else:
        raise ValueError(f"shadow rule must be 0-3, got {rule}")
    return out.select(
        "cluster_root", "n_members", "n_shadowed", "n_visible", "members"
    )
