"""Extra benchmarks — noop-sink stage isolation (optimization guide §1.4).

NOT part of the frozen driver contract (bench.py). Used to decompose the
expensive queries into stages, A/B candidate rewrites, and record evidence
for OPTIMIZATION_r06.md.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py text
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py plans
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timeit(spark, label: str, mk, reps: int = 2) -> float:
    """warm-min over reps runs; mk() builds a fresh DataFrame each run."""
    best = float("inf")
    for _ in range(max(reps, 1)):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        _force(mk())
        best = min(best, time.time() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"  {label:42s} {best:7.2f} s", flush=True)
    return best


def text_profile(spark, sf_dir: str) -> dict:
    from dupion_spark import queries as Q

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    avg_chars = docs.agg(F.avg("n_chars")).collect()[0][0]
    print(f"documents: {n_docs} rows, avg n_chars {avg_chars:.0f}", flush=True)

    out: dict[str, float] = {"n_docs": n_docs}

    def fresh():
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    # -- stage isolation of the current implementations -------------------
    out["shingle_arr_build"] = _timeit(
        spark, "shingle arrays only (interpreted transform)",
        lambda: fresh().select("doc_id", Q._doc_shingle_arr().alias("a")),
    )
    out["fp_current"] = _timeit(
        spark, "text_fingerprint CURRENT (map-side HOF)",
        lambda: Q.q_text_fingerprint(spark, sf_dir),
    )
    out["sig_current"] = _timeit(
        spark, "_minhash_sig CURRENT (explode distinct arr)",
        lambda: Q._minhash_sig(fresh()),
    )

    # pairs stage alone: signature eagerly checkpointed outside the clock
    sig_ckpt = Q._minhash_sig(fresh()).localCheckpoint(eager=True)
    out["pairs_given_sig"] = _timeit(
        spark, "_doc_pairs given checkpointed sig",
        lambda: Q._doc_pairs(sig_ckpt, n_docs=n_docs),
    )
    out["minhash_pairs_full"] = _timeit(
        spark, "dedup_minhash_pairs CURRENT (full)",
        lambda: Q.q_dedup_minhash_pairs(spark, sf_dir),
    )
    out["ngram_full"] = _timeit(
        spark, "ngram_jaccard CURRENT (full)",
        lambda: Q.q_ngram_jaccard(spark, sf_dir),
    )

    # -- candidates: codegen shingle rows (explode sequence + substr) -----
    K = Q.DOC_SHINGLE_K
    M31 = Q.M31

    def shingle_rows(d):
        n = F.greatest(F.length("text") - (K - 1), F.lit(1))
        return d.select(
            "doc_id", "text", F.explode(F.sequence(F.lit(1), n)).alias("i")
        ).select("doc_id", F.expr(f"substr(text, i, {K})").alias("shingle"))

    out["shingle_rows_codegen"] = _timeit(
        spark, "CAND shingle rows (codegen, dup-positions)",
        lambda: shingle_rows(fresh()),
    )

    def fp_cand():
        rows = shingle_rows(fresh())
        return rows.groupBy("doc_id").agg(
            F.min(Q._h60(F.col("shingle"))).alias("fingerprint")
        ).select("doc_id", "fingerprint")

    out["fp_cand"] = _timeit(spark, "CAND text_fingerprint (explode+min)", fp_cand)

    def sig_cand():
        rows = shingle_rows(fresh()).select(
            "doc_id", (Q._h60(F.col("shingle")) % M31).alias("base")
        )
        return rows.groupBy("doc_id").agg(
            *[
                F.min((F.col("base") * a + b) % M31).alias(f"h{i}")
                for i, (a, b) in enumerate(Q.DOC_MINHASH)
            ]
        )

    out["sig_cand"] = _timeit(spark, "CAND _minhash_sig (codegen rows)", sig_cand)

    # value-equality spot check of the candidates vs current (exceptAll both ways)
    cur_fp = Q.q_text_fingerprint(spark, sf_dir)
    d1 = cur_fp.exceptAll(fp_cand()).count()
    d2 = fp_cand().exceptAll(cur_fp).count()
    print(f"  fp candidate vs current: exceptAll {d1}/{d2}", flush=True)
    cur_sig = Q._minhash_sig(fresh())
    d3 = cur_sig.exceptAll(sig_cand()).count()
    d4 = sig_cand().exceptAll(cur_sig).count()
    print(f"  sig candidate vs current: exceptAll {d3}/{d4}", flush=True)
    out["fp_equal"] = (d1 == 0 and d2 == 0)
    out["sig_equal"] = (d3 == 0 and d4 == 0)
    return out


def dump_plans(spark, sf_dir: str, names: list[str], suffix: str) -> None:
    from dupion_spark import queries as Q

    os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
    registry = Q.queries()
    for name in names:
        df = registry[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(REPO, "plans", "r06", f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", flush=True)


def dump_media_plans(spark, sf_dir: str, suffix: str) -> None:
    from dupion_spark import media_queries as MQ

    os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
    MQ.ensure_oracle_fixture(os.path.basename(sf_dir.rstrip("/")))
    for name, fn in MQ.media_queries().items():
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(REPO, "plans", "r06", f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mode = sys.argv[1] if len(sys.argv) > 1 else "text"

    from dupion_spark.session import get_spark

    spark = get_spark("dupion_bench_extra", cores=cpus, shuffle_partitions=max(cpus, 8))
    if mode == "text":
        out = text_profile(spark, sf_dir)
        print(json.dumps({"profile": "text", "sf_dir": sf_dir, **out}))
    elif mode == "mediaplans":
        dump_media_plans(spark, sf_dir, sys.argv[2] if len(sys.argv) > 2 else "after")
    elif mode == "plans":
        names = sys.argv[2].split(",") if len(sys.argv) > 2 else [
            "text_fingerprint", "dedup_minhash_pairs", "ngram_jaccard"
        ]
        suffix = sys.argv[3] if len(sys.argv) > 3 else "before"
        dump_plans(spark, sf_dir, names, suffix)
    spark.stop()


if __name__ == "__main__":
    main()
