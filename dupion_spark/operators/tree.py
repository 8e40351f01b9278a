"""Tree output (reference P2/O3/O4/P4, dupion/src/output/tree.rs:26-151).

dupion's default human-facing view is a nested JSON tree: every node renders
as 'DUPS|UNIQ <icon> <name> <size>', children are sorted by
(icon_prio ASC, clamped-dup-count DESC, size DESC) (tree.rs:68 — the dup
count is clamped to [1,2], so the sort only separates duplicated from unique)
and DUPS nodes expand to the first 4 members of their duplicate group
(tree.rs:103-105). Icons + priorities (vfs/entry.rs:113-128):

    (is_dir, is_file): (T,T) archive 'A' prio 1, (F,T) file 'F' prio 2,
                       (T,F) dir 'D' prio 0, (F,F) gone 'X' prio 3.

Graft shape: the tree is root -> partition (dir) -> image (file); a partition
whose key is itself a row of the images table (an archive container,
sources/archive.py) gets the dual-nature 'A' icon. The scalable artifact is
the per-node ROW TABLE (tree_rows) — label, rank, preview — one row per tree
node; assemble_tree_json collects it into one nested JSON document, which is
a presentation step exactly like the reference's stdout serializer.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _clamped(col):
    return F.least(F.greatest(col, F.lit(1)), F.lit(2))


def tree_rows(
    hashes: DataFrame,
    partition_map: DataFrame,
    rollup: DataFrame,
    preview_k: int = 4,
) -> DataFrame:
    """One row per tree node:
    (parent, name, icon, icon_prio, dups, size, label, child_rank, preview).

    File nodes live under their part_key; dir (partition) nodes live under
    the synthetic root ''. dups = occurrence count of the node's content hash
    (pixel hash for files — byte hash when shape-pruned — rollup hash for
    dirs). preview = first `preview_k` sorted members of the node's duplicate
    group (empty for unique nodes), the O4 expansion."""
    content = F.coalesce(F.hex("pixel_sha256"), F.col("byte_sha256"))
    files = partition_map.join(hashes, "image_id").select(
        "image_id",
        F.col("part_key").alias("parent"),
        F.col("rel_name").alias("name"),
        F.col("byte_len").alias("size"),
        content.alias("h"),
    )
    fcounts = files.groupBy("h").agg(
        F.count(F.lit(1)).alias("dups"),
        F.array_join(
            F.slice(F.sort_array(F.collect_list("image_id")), 1, preview_k), ";"
        ).alias("preview"),
    )
    file_nodes = files.join(fcounts, "h").select(
        "parent",
        "name",
        F.lit("F").alias("icon"),
        F.lit(2).alias("icon_prio"),
        "dups",
        "size",
        F.when(F.col("dups") > 1, F.col("preview")).otherwise(F.lit("")).alias("preview"),
    )

    # dir nodes: partitions under the root; dual-nature containers (part_key
    # that is ALSO a file row, i.e. an archive) render 'A' prio 1. Semi-join
    # the corpus id column against the (small) partition-key set BEFORE the
    # distinct — AQE broadcasts the rollup side, so no corpus-wide shuffle
    containers = (
        hashes.select(F.col("image_id").alias("part_key"))
        .join(rollup.select("part_key"), "part_key", "left_semi")
        .distinct()
    )
    dcounts = rollup.groupBy("rollup_hash").agg(F.count(F.lit(1)).alias("dups"))
    dpreview = rollup.groupBy("rollup_hash").agg(
        F.array_join(
            F.slice(F.sort_array(F.collect_list("part_key")), 1, preview_k), ";"
        ).alias("preview")
    )
    dir_nodes = (
        rollup.join(dcounts, "rollup_hash")
        .join(dpreview, "rollup_hash")
        .join(
            containers.withColumn("_is_container", F.lit(True)),
            "part_key",
            "left",
        )
        .select(
            F.lit("").alias("parent"),
            F.col("part_key").alias("name"),
            F.when(F.col("_is_container"), F.lit("A")).otherwise(F.lit("D")).alias("icon"),
            F.when(F.col("_is_container"), F.lit(1)).otherwise(F.lit(0)).alias("icon_prio"),
            "dups",
            F.col("rollup_bytes").alias("size"),
            F.when(F.col("dups") > 1, F.col("preview")).otherwise(F.lit("")).alias("preview"),
        )
    )

    nodes = file_nodes.unionByName(dir_nodes)
    label = F.concat(
        F.when(F.col("dups") > 1, F.lit("DUPS")).otherwise(F.lit("UNIQ")),
        F.lit(" "),
        F.col("icon"),
        F.lit(" "),
        F.col("name"),
        F.lit(" "),
        F.col("size").cast("string"),
    )
    # child_rank = row_number per parent in the reference child order
    # (tree.rs:68). NOT a bare Window.partitionBy("parent"): every dir node
    # shares the synthetic parent '', so at 10^6 partitions that window
    # one-tasks the dir ranking — with_rank computes the identical ranks via
    # range-partition + per-parent offsets (operators/ranking.py).
    from dupion_spark.operators.ranking import with_rank

    sort_cols = [
        F.col("icon_prio").asc(),
        _clamped(F.col("dups")).desc(),
        F.col("size").desc(),
        F.col("name").asc(),
    ]
    return with_rank(
        nodes.withColumn("label", label), sort_cols, "child_rank",
        partition_cols=["parent"],
    ).select(
        "parent", "name", "icon", "icon_prio", "dups", "size",
        "label", "child_rank", "preview",
    )


def assemble_tree_json(rows: DataFrame) -> str:
    """Collect the node table into ONE nested JSON document (presentation —
    the reference serializes to stdout, tree.rs:135-151; do not call this on
    corpus-scale outputs, export tree_rows as a table instead)."""
    collected = rows.collect()
    by_parent: dict[str, list] = {}
    for r in collected:
        by_parent.setdefault(r["parent"], []).append(r)
    for children in by_parent.values():
        children.sort(key=lambda r: r["child_rank"])

    def node(r) -> dict | str:
        if r["dups"] > 1 and r["preview"]:
            return {m: " " for m in r["preview"].split(";")}
        # only dir/archive nodes resolve children: a FILE whose rel_name
        # happens to equal some partition's part_key must not adopt that
        # partition's children (parent keys and file names are different
        # namespaces)
        kids = by_parent.get(r["name"], []) if r["icon"] in ("D", "A") else []
        if not kids:
            return " "
        return {k["label"]: node(k) for k in kids}

    roots = by_parent.get("", [])
    return json.dumps({r["label"]: node(r) for r in roots}, indent=1, sort_keys=False)
