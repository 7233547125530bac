"""Profile the emb_ann_ivf / emb_neardup gate cost structure (r19 §1).

Decomposes the gate into its component jobs and times each with the
noop sink (guide §1.4), labeling jobs (§1.5). Usage:
    python tools/profile_ann.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from fstd2pandas_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, reps=3):
    spark = get_spark("profile_ann")
    best = float("inf")
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
    print(f"{label:45s} {best:8.3f} s (min of {reps})")
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("profile_ann")
    from pyspark.sql import functions as F
    from fstd2pandas_spark.operators.llm.similarity import (
        ivf_ann_topk, lloyd_refine, pq_adc_topk, pq_encode, pq_train,
        ivf_pq_topk, pq_reconstruct_col, cosine_col)

    emb = entry._load(spark, sf_dir, "embeddings")
    n = emb.count()
    print(f"embeddings rows: {n}")

    # --- training jobs (driver-side collects, timed end to end) ---
    timed("pq_train(m=8,ksub=16,iters=1)",
          lambda: pq_train(emb, m=8, ksub=16, dim=64, iters=1), reps)
    timed("lloyd_refine(n_cells=8,iters=1)",
          lambda: lloyd_refine(emb, 8, 64, iters=1), reps)

    cb = pq_train(emb, m=8, ksub=16, dim=64, iters=1)

    # --- per-arm noop timings (codebook prebuilt) ---
    timed("arm: ivf_ann_topk(refine=1) [incl lloyd]",
          lambda: noop(ivf_ann_topk(emb, k=5, n_cells=8, nprobe=2, dim=64,
                                    n_queries=10, refine=1)), reps)
    timed("arm: pq_encode+recon cosine (pq rows)",
          lambda: noop(pq_encode(emb, 8, 16, 64, codebook=cb).select(
              F.col("vec_id"),
              F.col("pq_packed"),
              F.round(cosine_col(
                  F.transform(F.col("embedding"),
                              lambda x: x.cast("double")),
                  pq_reconstruct_col(F.col("pq_codes"), 8, 16, 8, cb)),
                  6))), reps)
    timed("arm: pq_adc_topk (codebook given)",
          lambda: noop(pq_adc_topk(emb, k=5, m=8, ksub=16, dim=64,
                                   n_queries=10, codebook=cb)), reps)
    timed("arm: ivf_pq_topk(refine=1, cb given)",
          lambda: noop(ivf_pq_topk(emb, k=5, n_cells=8, nprobe=2, m=8,
                                   ksub=16, dim=64, n_queries=10,
                                   refine=1, codebook=cb)), reps)

    # --- the full gate: build latency vs action ---
    def full():
        t0 = time.perf_counter()
        df = entry.q_emb_ann_ivf(spark, sf_dir)
        t1 = time.perf_counter()
        df.count()
        t2 = time.perf_counter()
        print(f"   q_emb_ann_ivf build {t1-t0:.3f} s, count {t2-t1:.3f} s")
        return t2 - t0
    timed("gate: q_emb_ann_ivf build+count", full, reps)

    # --- emb_neardup for comparison ---
    def nd():
        t0 = time.perf_counter()
        df = entry.q_emb_neardup(spark, sf_dir)
        t1 = time.perf_counter()
        df.count()
        t2 = time.perf_counter()
        print(f"   q_emb_neardup build {t1-t0:.3f} s, count {t2-t1:.3f} s")
        return t2 - t0
    timed("gate: q_emb_neardup build+count", nd, reps)


if __name__ == "__main__":
    main()
