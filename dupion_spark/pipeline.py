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

    def _features() -> DataFrame:
        if source_path:
            return features_op.extract_features_from_files(spark, source_path, cfg)
        return features_op.features_from_dataframe(images, cfg)

    # Barrier policy (see CheckpointManager.stage): eager anchors ONLY where
    # concurrent AQE stage materialization would otherwise race a lazy
    # checkpoint (features/reps/pairs/verified_edges); single-ordered-
    # consumer stages are lazy (hashes/clusters/canonical — the first
    # consuming job materializes them, no extra barrier) or plain
    # composition. Each eager checkpoint is ~1s of serial wall, so the
    # policy trades the minimum barrier count that keeps materialization
    # race-free.
    feats = mgr.stage("features", _features)
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

    # signatures has exactly one consumer (bands) and bands' two references
    # (bucket counts + the sized join) shuffle on the SAME key, so Spark's
    # ReuseExchange computes the explode once and shares the shuffle output —
    # materializing either would add a barrier plus a multi-GB checkpoint
    # write (single-disk in local mode) for no reuse benefit
    sigs = mgr.stage(
        "signatures",
        lambda: features_op.signatures_from_features(feats, reps),
        ["features", "reps"],
        barrier=False,
    )
    bands = mgr.stage(
        "bands", lambda: lsh.band_table(sigs, cfg), ["signatures"], barrier=False
    )
    # candidate generation prefilters + dedupes inline (operators/lsh): the
    # materialized pairs table IS the verify input — raw band-collision pairs
    # never hit a barrier or a shuffle. Band rows carry the long surrogate
    # sid; the (sid -> image_id) map restores strings on the pair output.
    pairs = mgr.stage(
        "pairs",
        lambda: lsh.candidate_pairs(bands, cfg, id_map=sigs.select("sid", "rep_id")),
        ["bands"],
    )

    def _verify() -> DataFrame:
        if source_path:
            # features carry (file, row group) payload locators: verify reads
            # payloads worker-side — pair bytes never cross the Arrow boundary
            return verify.verified_edges_from_files(pairs, feats, cfg)
        return verify.verified_edges(pairs, images, cfg)

    edges = mgr.stage("verified_edges", _verify, ["pairs", "features"])

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
    # pass at 10^6-file scale.
    n_images = feats.count()
    n_hashed = hashes.filter(F.col("pixel_sha256").isNotNull()).count()
    metrics = {
        "n_images": n_images,
        "n_pixel_hashed": n_hashed,
        "prune_ratio": round(1.0 - n_hashed / max(n_images, 1), 4),
        "stages": {r.stage: {"rows": r.rows_out, "wall_ms": r.wall_ms, "resumed": r.resumed}
                   for r in mgr.records},
    }

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
