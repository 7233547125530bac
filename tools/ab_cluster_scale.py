"""Scale validation of the r18 label-propagation convergence change
(9bfce06: the per-round snapshot join -> a `_prev` column on the
checkpointed frame; 4 -> 0 Exchange per round in the convergence
check). Plan-true at sf0.1 but wall-clock invisible there; run OLD and
NEW same-process, interleaved, on a synthetic near-dup pair graph.

Usage: python tools/ab_cluster_scale.py [n_nodes] [rounds]
Graph shape mirrors near-dup reality (many small families) plus long
chains so propagation needs several rounds and the per-round cost
actually repeats. /tmp only; the old module is extracted from git.
"""
from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fstd2pandas_spark.session import get_spark

N_NODES = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
DATA = f"/tmp/scale_ab/pairs_{N_NODES}.parquet"
OLD_MOD = "/tmp/scale_ab/cluster_old.py"


def load_old():
    if not os.path.exists(OLD_MOD):
        os.makedirs("/tmp/scale_ab", exist_ok=True)
        src = subprocess.check_output(
            ["git", "show",
             "9bfce06~1:fstd2pandas_spark/operators/llm/cluster.py"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        with open(OLD_MOD, "wb") as f:
            f.write(src)
    spec = importlib.util.spec_from_file_location("cluster_old", OLD_MOD)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def synth(spark):
    if os.path.exists(os.path.join(DATA, "_SUCCESS")):
        return
    # 90% of nodes in 5-node families (near-clique dedup reality),
    # 10% in 40-node chains (forces ~log-diameter extra rounds so the
    # convergence check actually repeats)
    fam = (spark.range(int(N_NODES * 0.9))
           .select((F.col("id") - F.pmod(F.col("id"), F.lit(5))
                    ).alias("doc_a"),
                   F.col("id").alias("doc_b"))
           .filter("doc_a != doc_b"))
    base = int(N_NODES * 0.9)
    chain = (spark.range(base, N_NODES)
             .filter(F.pmod(F.col("id") - base, F.lit(40)) != 0)
             .select((F.col("id") - 1).alias("doc_a"),
                     F.col("id").alias("doc_b")))
    fam.unionByName(chain).write.mode("overwrite").parquet(DATA)


def main():
    spark = get_spark("ab_cluster_scale")
    synth(spark)
    pairs = spark.read.parquet(DATA)
    old = load_old()
    import fstd2pandas_spark.operators.llm.cluster as new

    variants = {"new": new.neardup_components,
                "old": old.neardup_components}
    a = variants["new"](pairs, max_iter=64)
    b = variants["old"](pairs, max_iter=64)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"value check: exceptAll diff rows = {diff} (rows: {a.count()})")
    assert diff == 0

    results = {k: [] for k in variants}
    for r in range(ROUNDS):
        for k in ("new", "old") if r % 2 == 0 else ("old", "new"):
            t0 = time.perf_counter()
            variants[k](pairs, max_iter=64) \
                .write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            results[k].append(dt)
            print(f"round {r} {k}: {dt:.2f} s")
    for k in variants:
        print(f"{k}: min {min(results[k]):.2f} s over {N_NODES:,} nodes")


if __name__ == "__main__":
    main()
