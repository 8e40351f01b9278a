"""Benchmark harness — one JSON line for the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], forcing full materialization through the noop
sink. Also runs the image near-dup pipeline on the deterministic synthetic
fixture at the matching scale and reports images/sec.

Extra modes:
  SPARK_GRAFT_SCALING=1 python bench.py
      additionally runs the pipeline at local[8] and local[32] on the SAME
      input and reports throughput at both + scaling efficiency (the
      sandbox's stand-in for the N vs 4N executor-count criterion), writing
      BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "q1_pricing",
    "a2_hash_groups",
    "a4_rollup",
    "a6_runlength",
    "o6_senpai_election",
    "o2_export_order",
    "j2_treediff",
    "j3_shadow",
    "dedup_exact_docs",
    "dedup_minhash_pairs",
    "ngram_jaccard",
    "text_fingerprint",
    "events_window_agg",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_headline(spark, sf_dir: str) -> dict[str, float]:
    from dupion_spark import queries as Q

    registry = Q.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        start = time.time()
        _force(registry[name](spark, sf_dir))
        timings[name] = round(time.time() - start, 3)
    return timings


def run_image_pipeline(spark, sf_dir: str) -> tuple[float, int]:
    from dupion_spark.config import DedupConfig
    from dupion_spark.image_queries import load_images
    from dupion_spark.pipeline import run_pipeline

    images = load_images(spark, sf_dir).cache()
    n = images.count()
    start = time.time()
    result = run_pipeline(spark, images, DedupConfig())
    _force(result.clusters)
    _force(result.canonical)
    elapsed = time.time() - start
    images.unpersist()
    return elapsed, n


def scaling_run(sf_dir: str) -> dict:
    """Same job at two parallelism levels (8 vs 32 cores) on one host —
    evidence for the N->4N scaling-efficiency criterion (no multi-node
    cluster in the sandbox)."""
    from dupion_spark.session import get_spark

    results = {}
    for cores in (8, 32):
        spark = get_spark(f"dupion_bench_{cores}", cores=cores,
                          shuffle_partitions=max(cores, 8))
        elapsed, n = run_image_pipeline(spark, sf_dir)
        results[cores] = {"sec": round(elapsed, 2),
                          "images_per_sec": round(n / elapsed, 1), "n_images": n}
        spark.stop()
    eff = results[32]["images_per_sec"] / (4 * results[8]["images_per_sec"])
    results["scaling_efficiency_8_to_32"] = round(eff, 3)
    return results


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from dupion_spark.session import get_spark

    spark = get_spark("dupion_bench", cores=cpus, shuffle_partitions=max(cpus, 8))

    timings = run_headline(spark, sf_dir)
    img_elapsed, n_images = run_image_pipeline(spark, sf_dir)
    timings["img_pipeline"] = round(img_elapsed, 3)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "img_pipeline_images_per_sec": round(n_images / img_elapsed, 1),
        "img_pipeline_n_images": n_images,
    }
    spark.stop()

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        scaling = scaling_run(sf_dir)
        payload["scaling"] = scaling
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
            fh.write(
                "# BENCH baseline — measured\n\n"
                f"Input: synthetic image+caption fixture at {sf_dir} scale "
                f"({scaling[8]['n_images']} images), full near-dup pipeline "
                "(hash -> signatures -> LSH -> verify -> CC -> canonical).\n\n"
                "| parallelism | wall sec | images/sec |\n|---|---|---|\n"
                f"| local[8] (N) | {scaling[8]['sec']} | {scaling[8]['images_per_sec']} |\n"
                f"| local[32] (4N) | {scaling[32]['sec']} | {scaling[32]['images_per_sec']} |\n\n"
                f"**Scaling efficiency N->4N: {scaling['scaling_efficiency_8_to_32']}**"
                " (criterion: >= 0.8; sandbox evidences executor-count scaling via"
                " cores-scaling on one host — no multi-node cluster available).\n"
            )

    print(json.dumps(payload))


if __name__ == "__main__":
    main()
