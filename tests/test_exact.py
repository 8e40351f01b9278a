import pytest
from pyspark.sql import functions as F

from dupion_spark.operators import exact


@pytest.fixture(scope="module")
def hashes(spark, images_df, cfg):
    return exact.exact_hash_table(images_df, cfg).cache()


@pytest.fixture(scope="module")
def reps(hashes):
    return exact.representatives(hashes).cache()


def test_hash_table_covers_all_rows(hashes, images_df):
    assert hashes.count() == images_df.count()
    assert hashes.select("image_id").distinct().count() == images_df.count()


def test_pruned_rows_cannot_be_exact_dups(hashes, images_df):
    """Shape-pruned rows (null pixel hash) must have a unique (w,h) — the
    prune is a NECESSARY condition, so no exact duplicate may be pruned."""
    pruned = hashes.filter(F.col("pixel_sha256").isNull())
    joined = pruned.join(images_df.select("image_id", "w", "h"), "image_id")
    shape_counts = images_df.groupBy("w", "h").count().filter("count > 1")
    bad = joined.join(shape_counts.select("w", "h"), ["w", "h"], "left_semi")
    assert bad.count() == 0


def test_exact_groups_match_golden_byte_dups(hashes, fixture_small):
    """Every planted byte-identical pair must land in the same pixel group."""
    assign = {
        r["image_id"]: bytes(r["pixel_sha256"])
        for r in hashes.filter(F.col("pixel_sha256").isNotNull()).collect()
    }
    blobs = fixture_small.images.set_index("image_id")["bytes"]
    for _, pair in fixture_small.golden_pairs.iterrows():
        if blobs[pair.id_l] == blobs[pair.id_r]:
            assert assign[pair.id_l] == assign[pair.id_r], (pair.id_l, pair.id_r)


def test_exact_groups_cover_planted_exact_kind(hashes, fixture_small):
    gc = fixture_small.golden_clusters
    exact_ids = set(gc[gc.kind == "exact"].image_id)
    groups = exact.exact_groups(hashes).collect()
    grouped_ids = {m for row in groups for m in row["members"]}
    assert exact_ids <= grouped_ids


def test_representatives_collapse_exact_groups(hashes, reps, images_df):
    assert reps.count() == images_df.count()
    joined = reps.join(hashes.select("image_id", "pixel_sha256"), "image_id")
    multi = (
        joined.filter(F.col("pixel_sha256").isNotNull())
        .groupBy("pixel_sha256")
        .agg(F.countDistinct("rep_id").alias("n_reps"))
        .filter(F.col("n_reps") > 1)
    )
    assert multi.count() == 0


def test_exact_edges_are_stars(hashes):
    edges = exact.exact_edges(hashes)
    assert edges.filter(F.col("id_l") >= F.col("id_r")).count() == 0
