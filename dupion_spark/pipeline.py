"""End-to-end near-duplicate pipeline orchestration.

The staged dataflow (SURVEY.md §3.1 "Spark shape"):

    images
      ├─ exact:   cheap keys → shape prune → pixel SHA-256 → hash groups
      ├─ reps:    collapse exact-identical rows to one LSH node
      ├─ sigs:    MinHash(caption) + SimHash/pHash(pixels) per rep
      ├─ bands:   LSH band explode → band_key
      ├─ pairs:   bucketed self-join (+ chain-links for hot buckets)
      ├─ edges:   PSNR/LCS verification of candidate pairs
      ├─ cc:      large-star/small-star connected components
      ├─ clusters: rep assignments expanded to all rows + singletons
      ├─ canonical: senpai election per cluster (O6)
      └─ rollup/shadow: per-partition rollup + duplicated-partition shadows

Every stage goes through the CheckpointManager (resume = skip stages whose
manifest chain matches), and stage/partition lineage + metrics accumulate per
run. Run `python -m dupion_spark.pipeline` for a quick local demo.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dupion_spark.config import DedupConfig
from dupion_spark.operators import connected_components as cc
from dupion_spark.operators import election, exact, lsh, rollup, verify
from dupion_spark.operators import features as features_op
from dupion_spark.sources.checkpoint import (
    CheckpointManager,
    file_fingerprints,
    fingerprint_files,
    partition_lineage,
)


@dataclass
class PipelineResult:
    hashes: DataFrame
    exact_groups: DataFrame
    clusters: DataFrame          # image_id, cluster_root
    canonical: DataFrame         # cluster_root, canonical_image_id, ...
    verified_edges: DataFrame
    candidate_pairs: DataFrame
    rollup: DataFrame | None
    shadows: DataFrame | None
    lineage: DataFrame
    metrics: dict
    metrics_table: DataFrame      # (metric, stage, value) — A7 metrics table


def run_pipeline(
    spark: SparkSession,
    images: DataFrame,
    cfg: DedupConfig | None = None,
    partition_map: DataFrame | None = None,
    checkpoint_dir: str | None = None,
    source_path: str | None = None,
) -> PipelineResult:
    """source_path: optional parquet file/dir holding the SAME rows as
    `images`. When given, per-image feature extraction reads the payloads
    directly in the Python workers (one task per parquet row group) instead
    of shipping the binary column through the JVM->Arrow boundary — measured
    ~60 MB/s aggregate for binary transfer in this environment, so direct
    storage reads are the scale path (operators/features.py)."""
    cfg = cfg or DedupConfig()
    # root-stage input fingerprint: a resumed run over changed input data must
    # NOT reuse checkpointed stages (dupion's (ctime,size) validation, F5).
    # File-backed inputs fingerprint by (name, size, mtime); DataFrame inputs
    # by a one-pass count + order-insensitive CONTENT hash — id alone is not
    # enough (a payload/caption edit under an unchanged id must invalidate the
    # chain, matching the reference's (ctime,size) content validation). One
    # pass, no shuffle: length(bytes) stands in for the payload so the hash
    # stays cheap; a same-id same-length byte flip is caught by the file path
    # (mtime) — the DataFrame path is the small-fixture/test path.
    # (Computed only when checkpointing is on — no manifests, no fingerprint.)
    input_fp = ""
    if checkpoint_dir:
        if source_path:
            input_fp = fingerprint_files(source_path)
        else:
            row = images.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(
                    F.bit_xor(F.xxhash64("image_id", F.length("bytes"), "caption")),
                    F.lit(0),
                ).alias("h"),
            ).collect()[0]
            input_fp = f"df:{row['n']}:{row['h']}"
    mgr = CheckpointManager(spark, checkpoint_dir, cfg, input_fingerprint=input_fp)

    # Per-row incremental resume (the reference's defining cache behavior:
    # vfs/entry.rs:173-198 keeps a row iff (ctime,size) match and pass 2
    # rehashes only rows without a valid cached hash). Graft at file-row
    # granularity: the features manifest stores a per-file fingerprint map;
    # when the chain is stale but SOME input files are unchanged, the rebuild
    # reuses their checkpointed feature rows and re-extracts (decodes) ONLY
    # new/changed files. `incr` carries the unchanged-file set forward so the
    # verify stage can likewise reuse prior pair verdicts whose endpoints'
    # content is provably unchanged. At 10^12 rows with daily appends this is
    # the difference between re-decoding the corpus and decoding the delta.
    incr: dict = {"reused_files": None, "manifest": {}}

    def _files_df(paths) -> DataFrame:
        """Tiny (src_file) DataFrame for semi-joining row sets by source file.
        A `Column.isin(<list>)` here would inline up to 10^6 string literals
        into the plan — driver-side analysis/serialization cost growing with
        the corpus file count, the exact bottleneck the distributed footer
        reads avoid. A broadcast semi-join keeps the plan O(1)."""
        return F.broadcast(
            spark.createDataFrame([(p,) for p in sorted(paths)], "src_file string")
        )

    def _features() -> DataFrame:
        if not source_path:
            return features_op.features_from_dataframe(images, cfg)
        current = file_fingerprints(source_path)
        prior = mgr.prior_manifest("features")
        if prior and prior.get("files") and prior.get("config_hash") == cfg.config_hash():
            prior_files = prior["files"]
            unchanged = sorted(
                p for p, fp in current.items()
                if p in prior_files and prior_files[p]["fp"] == fp
            )
            prior_df = mgr.prior_output("features") if unchanged else None
            if prior_df is not None:
                fresh = sorted(set(current) - set(unchanged))
                # fresh files get indices past every previously-used one so
                # their derived sids can never collide with reused rows'
                next_idx = int(prior.get("next_file_idx", len(prior_files)))
                fresh_idx = [(p, next_idx + i) for i, p in enumerate(fresh)]
                incr["manifest"] = {
                    "files": {
                        **{p: {"fp": current[p], "idx": prior_files[p]["idx"]}
                           for p in unchanged},
                        **{p: {"fp": current[p], "idx": i} for p, i in fresh_idx},
                    },
                    "next_file_idx": next_idx + len(fresh),
                }
                incr["reused_files"] = set(unchanged)
                reused = prior_df.join(_files_df(unchanged), "src_file", "left_semi")
                if not fresh:
                    return reused
                new_rows = features_op.extract_features_from_files(
                    spark, source_path, cfg, files_with_idx=fresh_idx
                )
                return reused.unionByName(new_rows)
        incr["manifest"] = {
            "files": {p: {"fp": fp, "idx": i}
                      for i, (p, fp) in enumerate(sorted(current.items()))},
            "next_file_idx": len(current),
        }
        return features_op.extract_features_from_files(spark, source_path, cfg)

    # Barrier policy (see CheckpointManager.stage): eager anchors ONLY where
    # concurrent AQE stage materialization would otherwise race a lazy
    # checkpoint (features/reps/pairs/verified_edges); single-ordered-
    # consumer stages are lazy (hashes/clusters/canonical — the first
    # consuming job materializes them, no extra barrier) or plain
    # composition. Each eager checkpoint is ~1s of serial wall, so the
    # policy trades the minimum barrier count that keeps materialization
    # race-free.
    feats = mgr.stage("features", _features,
                      manifest_extra=lambda: incr["manifest"])
    # corpus size (one metadata-cheap count on the materialized feature
    # anchor): reused for the A7 metrics AND as the adaptive band-plan hint
    n_images = feats.count()
    if incr["reused_files"] is not None:
        # lineage proof of the incremental rebuild: how many feature rows
        # were reused from the prior checkpoint vs actually re-extracted
        n_reused = feats.join(
            _files_df(incr["reused_files"]), "src_file", "left_semi"
        ).count()
        mgr.extra_lineage.append(("features", "rows_reused", n_reused))
        mgr.extra_lineage.append(
            ("features", "rows_recomputed", n_images - n_reused)
        )
    hashes = mgr.stage(
        "hashes", lambda: features_op.hashes_from_features(feats), ["features"],
        barrier="lazy",
    )
    # exact_groups is a single-consumer output projection — no extra barrier
    # (each eager checkpoint is ~1s of serial wall regardless of cluster size;
    # multi-consumer stages keep theirs so their shuffles run exactly once)
    groups = mgr.stage(
        "exact_groups", lambda: exact.exact_groups(hashes), ["hashes"],
        barrier=False,
    )
    # reps/pairs/verified_edges are EAGER anchors: their consumers reference
    # them from multiple concurrently-materialized AQE query stages, and a
    # lazy checkpoint materialized under that concurrency gets recomputed by
    # racing stages (measured: the pairs stage ran 124s at 8 cores inside
    # the pipeline vs 49s in isolation with eager parents — the anti-scaling
    # was racing recompute, not work)
    reps = mgr.stage("reps", lambda: exact.representatives(hashes), ["hashes"])

    # signatures has two consumers — bands, and the pairs stage's id_map
    # projection (sid -> rep_id). Both read the same cheap column slice of
    # the MATERIALIZED feature anchor, so no extra barrier is needed; but the
    # sid column's stability across those two re-derivations depends on feats
    # being an eager checkpoint (the DataFrame path derives sid via
    # monotonically_increasing_id, which is only stable over a materialized
    # source — the file path derives sid from data and has no such coupling).
    # features' barrier=True above is therefore load-bearing for sid.
    sigs = mgr.stage(
        "signatures",
        lambda: features_op.signatures_from_features(feats, reps),
        ["features", "reps"],
        barrier=False,
    )
    bands = mgr.stage(
        "bands", lambda: lsh.band_table(sigs, cfg, n_reps=n_images),
        ["signatures"], barrier=False,
    )
    # candidate generation prefilters + dedupes inline (operators/lsh): the
    # materialized pairs table IS the verify input — raw band-collision pairs
    # never hit a barrier or a shuffle. Band rows carry the long surrogate
    # sid; the (sid -> image_id) map restores strings on the pair output.
    pairs = mgr.stage(
        "pairs",
        lambda: lsh.candidate_pairs(
            bands, cfg, id_map=sigs.select("sid", "rep_id"), n_reps=n_images
        ),
        ["bands"],
    )
    # star-recall exposure metric: pairs whose ONLY provenance is hub-star
    # links (band_src 'star_*', operators/lsh) are the population exposed to
    # the documented over-cap star caveat — surfaced per run so saturation
    # degradation is visible instead of latent. One cheap count on the
    # already-materialized pair anchor.
    mgr.extra_lineage.append((
        "pairs", "star_only_pairs",
        pairs.filter(F.col("band_src").startswith("star_")).count(),
    ))

    def _verify() -> DataFrame:
        # incremental verdict reuse: a prior run's (id_l, id_r) verdict is
        # valid iff BOTH endpoints come from unchanged input files (content
        # identical => deterministic verify verdict identical) AND the pair
        # was regenerated by the CURRENT pair stage (so the edge set equals a
        # from-scratch run's exactly — a stale candidate that no longer
        # band-collides must not survive). Everything else is re-verified.
        fresh_pairs, cached = pairs, None
        prior_manifest = mgr.prior_manifest("verified_edges")
        if (
            incr["reused_files"]
            and prior_manifest
            and prior_manifest.get("config_hash") == cfg.config_hash()
        ):
            prior_edges = mgr.prior_output("verified_edges")
            if prior_edges is not None:
                stable = feats.join(
                    _files_df(incr["reused_files"]), "src_file", "left_semi"
                ).select("image_id")
                valid = (
                    prior_edges
                    .join(stable.withColumnRenamed("image_id", "id_l"),
                          "id_l", "left_semi")
                    .join(stable.withColumnRenamed("image_id", "id_r"),
                          "id_r", "left_semi")
                    .select("id_l", "id_r", "psnr", "lcs_len", "passed")
                    .localCheckpoint(eager=False)  # 2 consumers: join + anti
                )
                cached = pairs.join(valid, ["id_l", "id_r"]).select(
                    "id_l", "id_r", "band_src", "psnr", "lcs_len", "passed"
                )
                fresh_pairs = pairs.join(
                    valid.select("id_l", "id_r"), ["id_l", "id_r"], "left_anti"
                )
                mgr.extra_lineage.append(
                    ("verified_edges", "pairs_reused", cached.count())
                )
                mgr.extra_lineage.append(
                    ("verified_edges", "pairs_verified", fresh_pairs.count())
                )
        if source_path:
            # features carry (file, row group) payload locators: verify reads
            # payloads worker-side — pair bytes never cross the Arrow boundary
            out = verify.verified_edges_from_files(
                fresh_pairs, feats, cfg, gather_metrics=gather_acc
            )
        else:
            out = verify.verified_edges(fresh_pairs, images, cfg)
        return out.unionByName(cached) if cached is not None else out

    gather_acc: dict = {}
    edges = mgr.stage("verified_edges", _verify, ["pairs", "features"])
    if gather_acc:
        # decompress-volume accounting for the page-selective gather
        # (operators/verify.gather_payloads): bytes_total = what whole-chunk
        # reads would have decompressed, bytes_read = what the page walk paid
        for k in ("bytes_read", "bytes_total", "pages_read", "pages_total",
                  "fallback_rgs", "fallback_dense"):
            mgr.extra_lineage.append(
                ("verified_edges", f"gather_{k}", int(gather_acc[k].value))
            )

    def _cluster() -> DataFrame:
        near = edges.filter(F.col("passed")).select("id_l", "id_r")
        rep_assign = cc.connected_components(near, cfg.cc_max_iterations)
        rep_assign = cc.attach_singletons(
            rep_assign, reps.select(F.col("rep_id").alias("image_id")).distinct()
        )
        return cc.expand_representatives(rep_assign, reps)

    clusters = mgr.stage("clusters", _cluster, ["verified_edges", "reps"],
                         barrier="lazy")
    canonical = mgr.stage(
        "canonical", lambda: election.canonical_map(clusters, hashes),
        ["clusters", "hashes"], barrier="lazy",
    )

    roll = shadows = None
    lineage = mgr.lineage_df()
    if partition_map is not None:
        roll = mgr.stage(
            "rollup", lambda: rollup.rollup_table(hashes, partition_map), ["hashes"]
        )
        dup_parts = rollup.duplicated_partitions(roll)
        shadows = mgr.stage(
            "shadows", lambda: rollup.shadowed_images(partition_map, dup_parts), ["rollup"]
        )
        # per-partition lineage rows (north_rule): input row counts and
        # cluster-assignment counts per part_key, unioned under the
        # stage-level manifest records
        plin = partition_lineage(partition_map, "images").unionByName(
            partition_lineage(clusters.join(partition_map, "image_id"), "clusters")
        )
        plin = plin.select(
            "stage",
            "part_key",
            "rows_out",
            F.lit(None).cast("long").alias("wall_ms"),
            F.lit(False).alias("resumed"),
            F.lit("").alias("manifest_hash"),
        )
        lineage = lineage.unionByName(plin)

    # metrics: stage-1 prune ratio (BASELINE.md qualitative metric) + stage rows.
    # Counted over the checkpointed feature table (one row per input image) —
    # re-scanning the input source for a count would be a second full-footer
    # pass at 10^6-file scale. (n_images was counted right after the feature
    # stage — it also drives the adaptive band plan.)
    n_hashed = hashes.filter(F.col("pixel_sha256").isNotNull()).count()
    metrics = {
        "n_images": n_images,
        "n_pixel_hashed": n_hashed,
        "prune_ratio": round(1.0 - n_hashed / max(n_images, 1), 4),
        "stages": {r.stage: {"rows": r.rows_out, "wall_ms": r.wall_ms, "resumed": r.resumed}
                   for r in mgr.records},
    }
    if gather_acc:
        metrics["gather"] = {k: int(v.value) for k, v in gather_acc.items()}

    # A7 metrics TABLE (north_rule: metrics tables, not just a dict): global
    # counters + per-stage wall/rows, appendable to a run-history table
    metric_rows = [
        ("n_images", "*", float(n_images)),
        ("n_pixel_hashed", "*", float(n_hashed)),
        ("prune_ratio", "*", float(metrics["prune_ratio"])),
    ] + [
        (name, r.stage, float(val))
        for r in mgr.records
        for name, val in (("stage_wall_ms", r.wall_ms), ("stage_rows", r.rows_out))
    ]
    metrics_table = spark.createDataFrame(
        metric_rows, "metric string, stage string, value double"
    )

    return PipelineResult(
        hashes=hashes,
        exact_groups=groups,
        clusters=clusters,
        canonical=canonical,
        verified_edges=edges,
        candidate_pairs=pairs,
        rollup=roll,
        shadows=shadows,
        lineage=lineage,
        metrics=metrics,
        metrics_table=metrics_table,
    )


if __name__ == "__main__":  # quick local demo on the synthetic fixture
    import json

    from dupion_spark.session import get_spark
    from dupion_spark.sources.synth import generate

    spark = get_spark("dupion_spark_demo", cores=8)
    fixture = generate(500)
    images_df = spark.createDataFrame(fixture.images)
    parts_df = spark.createDataFrame(fixture.partition_map)
    result = run_pipeline(spark, images_df, partition_map=parts_df)
    print(json.dumps(result.metrics, indent=2))
    result.canonical.orderBy(F.desc("n_members")).show(10, truncate=False)
