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


# ---------------------------------------------------------------------------
# IVF (operators/ann.py)
# ---------------------------------------------------------------------------
from pyspark.sql import functions as F  # noqa: E402

from dupion_spark.operators import ann  # noqa: E402


def _brute_pairs(spark):
    return {
        (r["query_id"], r["neighbor_id"])
        for r in Q.q_emb_cosine_topk(spark, SF_DIR).collect()
    }


def test_ivf_cells_partition_corpus(spark):
    (emb,) = Q._tables(spark, SF_DIR, "embeddings")
    vecs = ann.normed_vecs(emb)
    cents = ann.seed_centroids(vecs, Q.IVF_K)
    assigned = ann.ivf_assign(vecs, cents)
    n = vecs.count()
    # exactly one cell per vector, all cells in range: the no-dedup search
    # invariant (cells PARTITION the corpus, unlike LSH buckets)
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    bad = assigned.filter(
        (F.col("cell_id") < 0) | (F.col("cell_id") >= Q.IVF_K)
    ).count()
    assert bad == 0


def test_ivf_full_probe_equals_brute_force(spark):
    """nprobe == K scans every cell -> IVF must return EXACTLY the
    brute-force top-k (same ids, ranks, cosines)."""
    (emb,) = Q._tables(spark, SF_DIR, "embeddings")
    vecs = ann.normed_vecs(emb).localCheckpoint(eager=False)
    cents = ann.seed_centroids(vecs, Q.IVF_K)
    assigned = ann.ivf_assign(vecs, cents)
    q = vecs.filter(F.col("vec_id") < Q.EMB_N_QUERIES)
    ivf = sorted(
        tuple(r) for r in
        ann.ivf_search(assigned, cents, q, Q.EMB_TOPK, nprobe=Q.IVF_K).collect()
    )
    brute = sorted(tuple(r) for r in Q.q_emb_cosine_topk(spark, SF_DIR).collect())
    assert ivf == brute


def test_ivf_recall_and_dense_ranks(spark):
    rows = Q.q_emb_ivf_topk(spark, SF_DIR).collect()
    by_q: dict[int, list[int]] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for qid, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (qid, ranks)
        assert len(ranks) <= Q.EMB_TOPK
    brute = _brute_pairs(spark)
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(brute & got) / len(brute)
    print(f"\nIVF recall vs brute force @ nprobe={Q.IVF_NPROBE}/{Q.IVF_K}: "
          f"{recall:.3f}")
    # nprobe/K = 1/4 of a near-random corpus; the gate sits below the
    # ~2x-random-scan behavior seen for LSH so fixture regen can't flap it
    assert recall >= 0.3, recall


def test_ivf_lloyd_refine_keeps_invariants(spark):
    """Lloyd rounds must actually move centroids, keep the corpus fully
    partitioned, and not degrade nprobe recall below the unrefined gate."""
    (emb,) = Q._tables(spark, SF_DIR, "embeddings")
    vecs = ann.normed_vecs(emb).localCheckpoint(eager=False)
    seeds = ann.seed_centroids(vecs, Q.IVF_K)
    refined = ann.lloyd_refine(vecs, seeds, iters=2)
    assert [c["cell_id"] for c in refined] == [c["cell_id"] for c in seeds]
    moved = sum(
        1 for s, r in zip(seeds, refined)
        if any(abs(a - b) > 1e-12 for a, b in zip(s["cv"], r["cv"]))
    )
    assert moved > 0, "Lloyd refinement changed nothing"
    assigned = ann.ivf_assign(vecs, refined)
    n = vecs.count()
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    q = vecs.filter(F.col("vec_id") < Q.EMB_N_QUERIES)
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann.ivf_search(
            assigned, refined, q, Q.EMB_TOPK, Q.IVF_NPROBE
        ).collect()
    }
    brute = _brute_pairs(spark)
    recall = len(brute & got) / len(brute)
    print(f"\nIVF+Lloyd recall @ nprobe={Q.IVF_NPROBE}/{Q.IVF_K}: {recall:.3f}")
    assert recall >= 0.3, recall


def test_ivf_assign_parity_at_production_k(spark):
    """K=512 (past IVF_LITERAL_MAX_K): the Arrow-batched matmul assignment
    must agree with the literal projection vector-for-vector — same rounded
    cosines, same lowest-cell_id tie-break. 2000 deterministic 64-dim
    vectors, 512 seed centroids."""
    import numpy as np

    rng = np.random.default_rng(512)
    mat = rng.normal(size=(2000, 64))
    rows = [(i, [float(x) for x in mat[i]]) for i in range(2000)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    vecs = ann.normed_vecs(emb).localCheckpoint(eager=False)
    cents = ann.seed_centroids(vecs, 512)
    assert len(cents) == 512 > ann.IVF_LITERAL_MAX_K

    bulk = {
        r["vec_id"]: r["cell_id"]
        for r in ann.ivf_assign(vecs, cents).collect()  # dispatches to matmul
    }
    literal = {
        r["vec_id"]: r["cell_id"]
        for r in ann._ivf_assign_literal(vecs, cents).collect()
    }
    assert bulk == literal
    # sanity: the dispatch really took the bulk path and partitioned fully
    assert len(bulk) == 2000
    assert set(bulk.values()) <= set(range(512))


def test_ivf_assign_small_k_stays_literal(spark):
    """Oracle-checked queries (K <= IVF_LITERAL_MAX_K) must keep the
    SQL-replicable literal plan: no python workers in the physical plan."""
    (emb,) = Q._tables(spark, SF_DIR, "embeddings")
    vecs = ann.normed_vecs(emb)
    cents = ann.seed_centroids(vecs, Q.IVF_K)
    plan = ann.ivf_assign(vecs, cents)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
