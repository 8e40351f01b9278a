"""Bucketed ANN (emb_lsh_knn) vs the brute-force baseline (emb_cosine_topk).

Recall here is a property of 8-plane sign-LSH + 1-bit multiprobe on the
driver's synthetic 64-dim embeddings — reported so regressions are visible;
the hard gate is modest because an 8-bit bucket split of a 64-dim space
legitimately loses far neighbors (the scale path trades recall for not
scanning the corpus)."""

from __future__ import annotations

from dupion_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_lsh_knn_recall_vs_brute_force(spark):
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in Q.q_emb_cosine_topk(spark, SF_DIR).collect()
    }
    ann = {
        (r["query_id"], r["neighbor_id"])
        for r in Q.q_emb_lsh_knn(spark, SF_DIR).collect()
    }
    assert brute, "brute-force baseline returned nothing"
    recall = len(brute & ann) / len(brute)
    print(f"\nANN recall vs brute force @ top-{Q.EMB_TOPK}: {recall:.3f} "
          f"({len(ann)} ANN pairs, {len(brute)} brute pairs)")
    # 2-bit multiprobe scans ~15% of this near-random corpus and recovers
    # ~0.38 of brute-force top-3 (2x better than a random 15% scan); the
    # gate is below the measured value to absorb fixture regeneration
    assert recall >= 0.3, recall


def test_lsh_knn_ranks_are_dense_per_query(spark):
    rows = Q.q_emb_lsh_knn(spark, SF_DIR).collect()
    by_q: dict[int, list[int]] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)
        assert len(ranks) <= Q.EMB_TOPK
