"""Scalable row_number: exact global/per-key ranks without a one-task window.

A bare `Window.orderBy(...)` (or `partitionBy(k)` with a hot key) funnels
every row of the ordering scope through ONE task — fine at 10^3 rows, a
serial bottleneck at 10^8. This helper computes the identical ranks in three
bounded steps:

  1. repartitionByRange over (partition_cols + sort order) — ranges follow
     the sort, so within any rank scope, earlier range-partitions hold
     earlier rows;
  2. row_number within (range partition, scope) — each task ranks only its
     slice;
  3. add the scope's cumulative row count over PRECEDING range partitions —
     the offset table has at most n_range_partitions rows per scope, so its
     window is bounded by the partition count, never by data size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_rank(
    df: DataFrame,
    sort_cols: list[Column],
    out_col: str,
    partition_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """df + an exact row_number column `out_col`, ranked per
    `partition_cols` scope (global when None/empty) in `sort_cols` order."""
    partition_cols = partition_cols or []
    spark = df.sparkSession
    nparts = num_partitions or max(spark.sparkContext.defaultParallelism, 16)
    range_cols = [F.col(c) for c in partition_cols] + sort_cols
    ranged = df.repartitionByRange(nparts, *range_cols).withColumn(
        "_rk_pid", F.spark_partition_id()
    )
    scope = ["_rk_pid", *partition_cols]
    ranked = ranged.withColumn(
        "_rk_within", F.row_number().over(Window.partitionBy(*scope).orderBy(*sort_cols))
    )
    counts = ranked.groupBy(*scope).agg(F.count(F.lit(1)).alias("_rk_cnt"))
    off_win = (
        Window.partitionBy(*partition_cols)
        if partition_cols
        else Window.partitionBy(F.lit(0))
    )
    offsets = counts.withColumn(
        "_rk_offset",
        F.coalesce(
            F.sum("_rk_cnt").over(
                off_win.orderBy("_rk_pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(*scope, "_rk_offset")
    return (
        ranked.join(offsets, scope)
        .withColumn(out_col, (F.col("_rk_within") + F.col("_rk_offset")).cast("int"))
        .drop("_rk_pid", "_rk_within", "_rk_offset")
    )
