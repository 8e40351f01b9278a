"""Group output with dupion's shadow rules (reference P1).

dupion/src/output/groups.rs:4-56 — per group (after dropping groups with <=1
members):

  hide_shadowed =
      rule 0: false                  (always show shadowed members)
      rule 1: n_visible == 0         (hide only in fully-shadowed groups)
      rule 2: n_visible != 1         (default: shadowed shown ONLY when
                                      exactly one member is visible)
      rule 3: true                   (never show shadowed members)

  skip the whole group when hide_shadowed AND n_visible <= 1
  (groups.rs:38); members printed = visible-only when hiding, all
  otherwise (groups.rs:44).

Expressed as one group aggregation + conditional filter/projection — the
same decision table for all four rules.
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
        hide = F.lit(False)
    elif rule == 1:
        hide = F.col("n_visible") == 0
    elif rule == 2:
        hide = F.col("n_visible") != 1
    elif rule == 3:
        hide = F.lit(True)
    else:
        raise ValueError(f"shadow rule must be 0-3, got {rule}")
    out = (
        grouped.withColumn("_hide", hide)
        .filter(~(F.col("_hide") & (F.col("n_visible") <= 1)))
        .withColumn(
            "members",
            F.when(F.col("_hide"), F.col("visible_members")).otherwise(
                F.col("all_members")
            ),
        )
    )
    return out.select(
        "cluster_root", "n_members", "n_shadowed", "n_visible", "members"
    )
