"""IVF (inverted-file) approximate nearest-neighbor search over an
embedding column — the classic coarse-quantizer ANN layout (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", 2011, §IV-A: IVF =
k-means cells + per-cell inverted lists + nprobe-cell search).

Shapes, designed for 10^12-row corpora:

- **Coarse quantizer (centroids) is driver-resident by design.** IVF keeps
  the centroid table small (K ~ sqrt(N); faiss defaults K<=2^18 even for
  billion-vector indexes) precisely so it can live with the query broker.
  Assignment is zero-shuffle at every K, with a K-dispatched physical form:
  below IVF_LITERAL_MAX_K the K centroids are baked into a literal
  projection (pure Catalyst expression, SQL-replicable — the path every
  oracle-checked query pins); above it the same argmax runs as ONE dense
  numpy matmul per Arrow batch inside a pandas UDF, the centroid matrix
  riding along in the serialized closure (K x dim doubles — a few MB even
  at faiss's 2^18 ceiling). The matmul form exists because the obvious
  "broadcast join + max_by" alternative is NOT shuffle-free in practice: a
  corpus x K broadcast join materializes K rows per vector before the
  aggregate, and the final per-vec_id agg still exchanges one row per
  vector (unique keys defeat partial aggregation) — at 10^12 rows that is
  a corpus-scale shuffle plus a 10^15-row intermediate. The matmul touches
  each batch once, allocates nothing per row, and is the faiss coarse-
  quantization kernel expressed in Arrow batches.
- **Cells partition the corpus** (each vector lives in exactly one cell),
  so nprobe search needs no candidate dedup — unlike multiprobe sign-LSH
  (queries.q_emb_lsh_knn) where overlapping buckets force a
  dropDuplicates. Search work per query is ~ nprobe/K of the corpus.
- **Seeding is deterministic**: the K smallest vec_ids are the seed
  centroids. That makes the whole index SQL-replicable (the DuckDB oracle
  recomputes identical cells), and seeds-as-centroids is the degenerate
  0-iteration case of k-means. `lloyd_refine` runs real Lloyd rounds
  fully JVM-side (posexplode -> per-dimension avg -> array rebuild) for
  quality; the oracle-checked query path pins iters=0 for cross-engine
  reproducibility.

The reference has no ANN operator — this extends the engine for
training-data pipelines (embedding near-dup / retrieval), alongside
brute-force cosine (queries.q_emb_cosine_topk, the correctness baseline)
and sign-LSH multiprobe (queries.q_emb_lsh_knn).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["normed_vecs", "seed_centroids", "ivf_assign", "lloyd_refine",
           "ivf_probe", "ivf_search"]

# ranking cosines are rounded so argmax/argmin ties break identically across
# engines (float-fold order differences live far below 1e-9 here)
_RANK_DP = 9


def normed_vecs(emb: DataFrame) -> DataFrame:
    """(vec_id, v: array<double>, norm) from the raw embeddings table."""
    vecs = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    return vecs.withColumn("norm", norm)


def seed_centroids(vecs: DataFrame, k: int) -> list[dict]:
    """Deterministic coarse quantizer: the k smallest vec_ids, numbered
    0..k-1 in vec_id order. Returns driver-side rows
    [{cell_id, cv: list[float], cn}] — bounded by k, never by the corpus."""
    rows = (
        vecs.orderBy("vec_id").limit(k)
        .select("vec_id", "v", "norm")
        .collect()
    )
    return [
        {"cell_id": i, "cv": list(r["v"]), "cn": float(r["norm"])}
        for i, r in enumerate(rows)
    ]


def _cos_to(cent: dict):
    """Literal-coefficient cosine of column `v` against one centroid."""
    coeffs = F.array(*[F.lit(float(c)) for c in cent["cv"]])
    dot = F.aggregate(
        F.zip_with("v", coeffs, lambda a, b: a * b), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.round(dot / (F.col("norm") * F.lit(cent["cn"])), _RANK_DP)


# Above this K the literal-projection assignment stops being sensible (the
# expression tree carries K*dim literals through analysis/codegen; Catalyst
# compile time grows with K and the generated method eventually exceeds JVM
# limits) and assignment dispatches to the Arrow-batched matmul. 64 keeps
# every oracle-checked query (K <= 16) on the SQL-replicable literal path
# while production K (10^3..10^5 cells) gets the vectorized kernel.
IVF_LITERAL_MAX_K = 64


def ivf_assign(vecs: DataFrame, centroids: list[dict]) -> DataFrame:
    """Assign every vector to its nearest centroid (highest cosine, ties ->
    lowest cell_id), zero-shuffle at any corpus size. K-dispatched physical
    form (see module docstring): literal projection below IVF_LITERAL_MAX_K
    — the K cosines form an array literal-expression; argmax =
    array_position of the max (first match == lowest cell_id) — and the
    Arrow-batched numpy matmul above it. Both paths round cosines to the
    same _RANK_DP and break ties to the lowest cell_id, so they assign
    identically (parity pytest at K=512, tests/test_ann.py)."""
    if len(centroids) > IVF_LITERAL_MAX_K:
        return _ivf_assign_bulk(vecs, centroids)
    return _ivf_assign_literal(vecs, centroids)


def _ivf_assign_literal(vecs: DataFrame, centroids: list[dict]) -> DataFrame:
    """Small-K assignment as a pure Catalyst literal projection (the
    SQL-replicable form the oracle-checked queries pin)."""
    cos_arr = F.array(*[_cos_to(c) for c in centroids])
    return vecs.withColumn(
        "cell_id",
        (F.array_position(cos_arr, F.array_max(cos_arr)) - 1).cast("int"),
    )


def _ivf_assign_bulk(vecs: DataFrame, centroids: list[dict]) -> DataFrame:
    """Production-K assignment: one dense (batch x dim) @ (dim x K) numpy
    matmul per Arrow batch inside a pandas UDF. The centroid matrix is
    pre-normalized driver-side and ships in the UDF closure (K x dim
    doubles); each executor deserializes it once per python worker, not per
    batch. No corpus shuffle, no K-row blowup, no per-row python."""
    from pyspark.sql.functions import pandas_udf

    cmat = np.array([c["cv"] for c in centroids], dtype=np.float64)
    cnorm = np.array([c["cn"] for c in centroids], dtype=np.float64)
    cnorm[cnorm == 0.0] = 1.0
    # (dim x K) with the centroid norm folded in: cos = (v @ cn) / |v|
    cmat_n = (cmat / cnorm[:, None]).T.copy()

    @pandas_udf("int")
    def _assign(v: pd.Series, norm: pd.Series) -> pd.Series:
        mat = np.array(v.tolist(), dtype=np.float64)
        n = norm.to_numpy(dtype=np.float64).copy()
        n[n == 0.0] = 1.0
        cos = np.round((mat @ cmat_n) / n[:, None], _RANK_DP)
        # np.argmax returns the FIRST max — the lowest cell_id, matching the
        # literal path's array_position tie-break
        return pd.Series(cos.argmax(axis=1).astype("int32"))

    return vecs.withColumn("cell_id", _assign("v", "norm"))


def lloyd_refine(
    vecs: DataFrame, centroids: list[dict], iters: int
) -> list[dict]:
    """Lloyd's k-means rounds, JVM-side: assign -> per-cell per-dimension
    mean (posexplode + avg, map-side combinable) -> rebuild centroid arrays.
    Each round collects only the K refreshed centroids. Empty cells keep
    their previous centroid (standard practice; avoids dead-cell NaNs)."""
    for _ in range(iters):
        assigned = ivf_assign(vecs, centroids)
        means = (
            assigned.select("cell_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
            .collect()
        )
        fresh = {int(r["cell_id"]): list(r["cv"]) for r in means}
        nxt = []
        for c in centroids:
            cv = fresh.get(c["cell_id"], c["cv"])
            cn = sum(x * x for x in cv) ** 0.5
            if cn == 0.0:  # degenerate all-zero mean: keep the old centroid
                cv, cn = c["cv"], c["cn"]
            nxt.append({"cell_id": c["cell_id"], "cv": cv, "cn": cn})
        centroids = nxt
    return centroids


def ivf_probe(
    queries: DataFrame, centroids: list[dict], nprobe: int
) -> DataFrame:
    """(query_id, qv, qn, cell_id) — each query's nprobe nearest cells.
    The probe table is tiny (n_queries x nprobe): explode the K per-query
    cosines and rank. Window cost is bounded by the QUERY side only."""
    cells = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c["cell_id"]).alias("cell_id"),
                        _cos_to(c).alias("ccos"),
                    )
                    for c in centroids
                ]
            )
        ).alias("pc"),
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("pc.ccos").desc(), F.col("pc.cell_id").asc()
    )
    return (
        cells.withColumn("prn", F.row_number().over(win))
        .filter(F.col("prn") <= nprobe)
        .select("query_id", "qv", "qn", F.col("pc.cell_id").alias("cell_id"))
    )


def ivf_search(
    assigned: DataFrame,
    centroids: list[dict],
    queries: DataFrame,
    topk: int,
    nprobe: int,
) -> DataFrame:
    """Top-k cosine neighbors per query, scanning only the nprobe probed
    cells. Returns (query_id, neighbor_id, rank, cosine). The probe side is
    broadcast (n_queries x nprobe rows) so the corpus-side inverted lists
    are filtered by a map-side hash join — no corpus shuffle; candidate
    volume ~ corpus * nprobe / K."""
    probes = ivf_probe(queries, centroids, nprobe)
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda a, b: a * b), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(probes)
        .join(assigned, "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot / (F.col("qn") * F.col("norm")), 6).alias("cosine"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
