"""Iterative graph algorithms over edge DataFrames: PageRank.

Spark-first shape (the Pregel-lite idiom): the graph lives as an edge
DataFrame, one iteration is ONE shuffle (contributions grouped by
destination) plus a single-row dangling-mass aggregate, and
``localCheckpoint`` cuts the lineage each round so ten iterations cost
ten shuffles, not an exponentially re-derived plan. The (src, dst,
out-degree) build side is checkpointed once and reused by every
iteration.

Determinism contract (what makes an ITERATIVE float algorithm
oracle-gatable): ranks live as INTEGER units (``scale`` = 1e9 by
default), every step is integer arithmetic — ``div`` floor division
for the per-edge share and the damping ratio, integer sums that are
associative and order-free — so the result is bit-identical on any
engine, partitioning, or execution order, and an SQL oracle can unroll
the same recurrence. This is a deterministic *variant* of PageRank
(each division floors at 1e-9 resolution), not a bit-for-bit match of
any float implementation; convergence behavior is the same.

At 100 TB: the per-iteration shuffle is keyed by ``dst`` — skew on a
celebrity node is an AQE skew-join case, and the dangling aggregate is
a 1-row driver scalar per iteration (bounded by construction, the same
contract as the sketch parameter checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _release_checkpoint(df: DataFrame) -> None:
    """Free a superseded localCheckpoint's storage. PySpark exposes no
    public unpersist for local checkpoints — ``df.rdd.unpersist()``
    derives a NEW rdd and frees nothing (verified empirically against
    ``getPersistentRDDs``) — but a checkpointed frame's analyzed plan
    is a ``LogicalRDD`` holding the cached rdd directly. Best-effort
    by design (internal API): a failure costs memory, never
    correctness."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iters: int = 5, damping_num: int = 85,
             damping_den: int = 100, scale: int = 10 ** 9) -> DataFrame:
    """Integer-unit PageRank over the DISTINCT (src, dst) edge set.

    Returns (node, r) where ``r`` is the rank in ``1/scale`` units;
    ranks start uniform at ``scale div N`` and each iteration applies

        r'[v] = (scale * (den - num)) div (den * N)
                + (num * (contrib[v] + D div N)) div den

    with ``contrib[v] = sum over in-edges (u, v) of r[u] div
    outdeg[u]`` and ``D`` the summed rank of dangling nodes (no
    out-edges), redistributed uniformly — the standard dangling-mass
    treatment, floored to integers.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not (0 < damping_num < damping_den):
        raise ValueError("need 0 < damping_num < damping_den")
    if scale < 1:
        raise ValueError("scale must be >= 1")
    e = (edges.select(F.col(src).cast("long").alias("src"),
                      F.col(dst).cast("long").alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct())
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("r", F.lit(0).cast("long"))
    if scale < n:
        # scale // n == 0 would zero every rank silently from
        # iteration 1 — refuse, matching the sketch parameter contract
        raise ValueError(
            f"scale ({scale}) must be >= node count ({n}) or every "
            "integer rank floors to 0")
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ed = e.join(outdeg, "src").localCheckpoint()   # reused per iteration
    dangling = (nodes.join(outdeg.withColumnRenamed("src", "node"),
                           "node", "left_anti").localCheckpoint())
    teleport = (scale * (damping_den - damping_num)) \
        // (damping_den * n)
    ranks = nodes.select("node",
                         F.lit(scale // n).cast("long").alias("r"))
    prev = None
    for _ in range(iters):
        contrib = (ed.join(ranks, ed["src"] == ranks["node"])
                   .select(F.col("dst"),
                           F.expr("r div deg").alias("_sh"))
                   .groupBy("dst").agg(F.sum("_sh").alias("_c")))
        # dangling mass: ONE scalar per iteration (bounded driver
        # round-trip — the redistribute-uniformly constant)
        d_total = (dangling.join(ranks, "node")
                   .agg(F.sum("r").alias("s")).first()["s"]) or 0
        d_share = int(d_total) // n
        ranks = (nodes.join(contrib, nodes["node"] == contrib["dst"],
                            "left")
                 .select(F.col("node"),
                         (F.lit(int(teleport))
                          + F.expr(f"({int(damping_num)} * "
                                   f"(coalesce(_c, CAST(0 AS BIGINT)) "
                                   f"+ {int(d_share)})) "
                                   f"div {int(damping_den)}"))
                         .cast("long").alias("r"))
                 .localCheckpoint())
        # localCheckpoint is eager, so the superseded snapshot can be
        # released immediately — without this, k iterations pin k full
        # N-row rank snapshots in block-manager storage until GC
        if prev is not None:
            _release_checkpoint(prev)
        prev = ranks
    return ranks
