"""Candidate-pair verification: decoded-pixel PSNR + caption suffix-array LCS.

The expensive compare of the staged design (the graft's analog of dupion's
full blake3 re-read in pass 2, driver/platterwalker.rs:188-374): runs ONLY on
pairs that survived LSH banding.

Scale notes: the two payload joins (attach bytes/caption for each side) are
sort-merge joins on image_id; pairs are orders of magnitude fewer than rows,
so each join shuffles the pair table plus a semi-join-pruned slice of the
image table. The verify UDF receives Arrow batches bounded by
spark.sql.execution.arrow.maxRecordsPerBatch so executor memory stays bounded
(two decoded images per pair in flight per row)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dupion_spark.config import DedupConfig
from dupion_spark.functions.spark_udfs import make_verify_udf


GATHER_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("caption", T.StringType()),
    ]
)


def gather_payloads(
    pairs: DataFrame, features: DataFrame, gather_metrics: dict | None = None
) -> DataFrame:
    """Candidate-endpoint payload gather — each needed row group is read ONCE
    cluster-wide, and within a row group only the data PAGES holding a
    candidate endpoint are decompressed.

    Pair endpoints are semi-joined against the (file, row_group) payload
    locators from the feature pass, partitioned BY row group (explicit
    partition count — without it AQE coalesces the tiny locator rows into one
    partition and a single Python worker does every read), and each task
    reads its row groups directly, emitting only the endpoint payload rows
    (id, bytes, caption). Output size is proportional to the CANDIDATE set,
    not the corpus — the compact slice then feeds the ordinary join+UDF
    verify. An earlier design partitioned by PAIR and re-read row groups per
    batch: the right side of a pair list touches nearly every row group, so
    every worker re-decompressed most of the corpus regardless of
    parallelism — measured as a ~14 s parallelism-independent floor.

    The page-selective read (functions/pagegather) walks the chunk's page
    headers and decompresses only pages covering requested row positions —
    candidates are sparse, so most of the corpus' compressed bytes are never
    touched (the round-3 verdict's last perf-weak item). Any file shape
    outside the fast path's envelope (v2 pages, exotic encodings) falls back
    to the pyarrow whole-row-group read, so correctness never depends on the
    page walk. NOTE the fixture writer must not dictionary-encode the blob
    column: a dict-encoded chunk keeps every payload in its dictionary page,
    which forces a full-chunk decompress regardless of selectivity (synth.py
    writes bytes with use_dictionary off, as production blob writers do).

    gather_metrics: optional dict that receives Spark accumulators
    {bytes_read, bytes_total, pages_read, pages_total, fallback_rgs};
    *_total = what whole-chunk reads would decompress, *_read = what the
    selective path actually decompressed. Valid after the gather runs."""
    ids = pairs.select(F.col("id_l").alias("image_id")).unionByName(
        pairs.select(F.col("id_r").alias("image_id"))
    ).distinct()
    loc = features.select(
        "image_id", "src_file", "src_rg", "src_pos", "caption"
    ).join(ids, "image_id", "left_semi")
    spark = pairs.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism * 2, 8)
    sc = spark.sparkContext
    acc = {
        "bytes_read": sc.accumulator(0),
        "bytes_total": sc.accumulator(0),
        "pages_read": sc.accumulator(0),
        "pages_total": sc.accumulator(0),
        "fallback_rgs": sc.accumulator(0),
        # fallbacks split by cause: dense = the density cutoff chose the
        # C++ whole-chunk read on purpose; the rest are envelope misses
        # (v2 pages, exotic encodings, ...) — the two need different fixes,
        # and a counter that conflates them hides which one is happening
        "fallback_dense": sc.accumulator(0),
    }
    if gather_metrics is not None:
        gather_metrics.update(acc)

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from dupion_spark.functions import pagegather

        for pdf in batches:
            needed: dict[tuple[str, int], list[tuple[int, str, str]]] = {}
            for f, rg, pos, i, cap in zip(pdf["src_file"], pdf["src_rg"],
                                          pdf["src_pos"], pdf["image_id"],
                                          pdf["caption"]):
                needed.setdefault((f, int(rg)), []).append((int(pos), i, cap))
            out_ids, out_bytes, out_caps = [], [], []
            for (f, rg), rows in needed.items():
                rows.sort()
                positions = [p for p, _, _ in rows]
                stats = pagegather.GatherStats()
                try:
                    blobs = pagegather.read_binary_rows(
                        f, rg, "bytes", positions, stats
                    )
                    acc["pages_total"].add(stats.pages_total)
                    acc["pages_read"].add(stats.pages_read)
                    acc["bytes_total"].add(stats.bytes_total)
                    acc["bytes_read"].add(stats.bytes_read)
                except pagegather.Unsupported as exc:
                    if str(exc).startswith("dense:"):
                        acc["fallback_dense"].add(1)
                    # whole-row-group fallback: read only the bytes column and
                    # `take` the needed positions (the pre-round-4 path)
                    pf = pq.ParquetFile(f)
                    blobs = [
                        b.as_py()
                        for b in pf.read_row_group(rg, columns=["bytes"])
                        .column("bytes")
                        .take(pa.array(positions, type=pa.int64()))
                    ]
                    chunk_bytes = 0
                    md = pf.metadata.row_group(rg)
                    for ci in range(md.num_columns):
                        col = md.column(ci)
                        if col.path_in_schema == "bytes":
                            chunk_bytes = col.total_uncompressed_size
                    acc["fallback_rgs"].add(1)
                    acc["bytes_total"].add(chunk_bytes)
                    acc["bytes_read"].add(chunk_bytes)
                for (_, i, cap), blob in zip(rows, blobs):
                    out_ids.append(i)
                    out_bytes.append(blob)
                    out_caps.append(cap)
            yield pd.DataFrame(
                {"image_id": out_ids, "bytes": out_bytes, "caption": out_caps}
            )

    return loc.repartition(n_parts, "src_file", "src_rg").mapInPandas(
        fetch, GATHER_SCHEMA
    )


def verified_edges_from_files(
    pairs: DataFrame, features: DataFrame, cfg: DedupConfig,
    gather_metrics: dict | None = None,
) -> DataFrame:
    """Worker-side pair verification — the scale path for file-backed inputs:
    gather_payloads fetches only the candidate-endpoint payloads straight
    from storage (no corpus re-scan, no corpus shuffle), then the compact
    slice runs through the same join+UDF verify as the DataFrame path."""
    payload = gather_payloads(pairs, features, gather_metrics).localCheckpoint(
        eager=False
    )
    # the gather output is ALREADY pruned to pair endpoints — re-running the
    # semi-join (and checkpointing the pruned copy a second time) would
    # double-write the candidate payload bytes through the single local disk
    return verified_edges(pairs, payload, cfg, payload_pruned=True)


def verified_edges(
    pairs: DataFrame, images: DataFrame, cfg: DedupConfig,
    payload_pruned: bool = False,
) -> DataFrame:
    """pairs(id_l, id_r, band_src) x images -> verified edge table
    (id_l, id_r, band_src, psnr, lcs_len, passed).

    payload_pruned: the caller guarantees `images` is already restricted to
    pair endpoints (and materialized) — skip the endpoint semi-join."""
    payload = images.select("image_id", "bytes", "caption")
    # prune the payload to ids that appear in any pair before joining — at
    # 10^12 rows this keeps the shuffled image slice proportional to the
    # candidate set, not the corpus. NO forced broadcast: the id set is all
    # endpoints of all candidate pairs, which at corpus scale can be billions
    # of rows — a broadcast hint would OOM the driver. AQE converts the
    # semi-join to broadcast automatically whenever the set IS small. The
    # payload is then MATERIALIZED once, because the plan below references it
    # twice (left and right side) and re-executing the semi-join scan twice
    # doubles the corpus reads.
    if not payload_pruned:
        ids = pairs.select(F.col("id_l").alias("image_id")).unionByName(
            pairs.select(F.col("id_r").alias("image_id"))
        ).distinct()
        payload = payload.join(ids, "image_id", "left_semi")
        payload = payload.localCheckpoint(eager=False)

    left = payload.select(
        F.col("image_id").alias("id_l"),
        F.col("bytes").alias("bytes_l"),
        F.col("caption").alias("caption_l"),
    )
    right = payload.select(
        F.col("image_id").alias("id_r"),
        F.col("bytes").alias("bytes_r"),
        F.col("caption").alias("caption_r"),
    )
    verify = make_verify_udf(cfg)
    # MERGE hints pin both payload joins to sort-merge — the plan the header
    # docstring promises. Without them the static planner sizes the gather
    # mapInPandas output from its LOCATOR input (a few MB of ids+offsets),
    # decides the blob-bearing payload side is the smaller relation, and
    # broadcasts it: building that broadcast collects every candidate blob to
    # the driver (measured at 300k: 16 tasks x ~83 MB of payload rows blew
    # spark.driver.maxResultSize at 1 GiB and killed the checkpointed run).
    # SMJ shuffles each side by id, sorts, and spills — no driver collect at
    # any candidate volume; the sort cost is noise next to decode in verify.
    # AQE preserves user join hints when it replans, so the runtime can't
    # re-introduce the broadcast from the same misestimate.
    return (
        pairs.join(left.hint("merge"), "id_l")
        .join(right.hint("merge"), "id_r")
        .withColumn(
            "_v",
            verify(
                F.col("bytes_l"), F.col("bytes_r"),
                F.col("caption_l"), F.col("caption_r"),
            ),
        )
        .select(
            "id_l",
            "id_r",
            "band_src",
            F.col("_v.psnr").alias("psnr"),
            F.col("_v.lcs_len").alias("lcs_len"),
            F.col("_v.passed").alias("passed"),
        )
    )
