"""Connected components over near-duplicate pair graphs.

The step after candidate-pair generation in a dedup pipeline: group the
pairs into duplicate clusters and elect one canonical document per
cluster (the min id). Iterative min-label propagation — each round every
node takes the minimum label in its closed neighbourhood — converges in
O(graph diameter) rounds; near-dup graphs are near-cliques per
duplicate family, so 2-3 rounds typically suffice.

Spark shape per round: one equi-join (edges x labels) + one groupBy min
— both shuffle on the node id and co-partition after the first round.
Lineage is truncated with an eager checkpoint every round (the standard
iterative-algorithm idiom: without it the plan doubles per iteration),
and convergence is detected with a bounded count action. The checkpoint
machinery — superseded-snapshot release so k rounds never pin k V-row
label snapshots, and the ``checkpoint_dir`` RELIABLE option for
preemptible fleets — is the shared
:mod:`~fstd2pandas_spark.operators.iterative` home, one definition with
PageRank so a hardening fix can never miss one of the two loops.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)

from fstd2pandas_spark.operators.iterative import (
    make_checkpointer, release_checkpoint,
)


class ConvergenceError(RuntimeError):
    """Label propagation needed more rounds than the caller allowed."""


def neardup_components(pairs: DataFrame, id_a: str = "doc_a",
                       id_b: str = "doc_b", max_iter: int = 20,
                       checkpoint: bool = True,
                       require_convergence_within: "int | None" = None,
                       checkpoint_dir: "str | None" = None,
                       ) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = min
    node id reachable through the pair graph. ``max_iter`` bounds the
    rounds (diameter guard); iteration stops early at the first round
    that changes no label.

    ``require_convergence_within=N`` raises :class:`ConvergenceError` if
    labels are still changing after N rounds — used by callers whose
    expected output is pinned to an N-round unroll (the gated oracle),
    so a graph-shape change fails loudly instead of silently diverging
    from the pinned expectation.

    ``checkpoint_dir``: per-round label state uses RELIABLE checkpoints
    under this directory (survives executor loss — the preemptible-
    fleet mode); the default eager ``localCheckpoint`` is faster but
    not fault-tolerant. Each round's superseded local snapshot is
    RELEASED as soon as the convergence check has read it, so a k-round
    propagation holds at most two label snapshots in block-manager
    storage, never k (shared machinery: operators/iterative.py)."""
    if checkpoint_dir is not None and not checkpoint:
        # the caller asked for fault-tolerant reliable checkpoints AND
        # for no checkpointing at all — honoring either half silently
        # betrays the other (and would mutate the context's global
        # checkpoint dir for nothing); refuse the contradiction
        raise ValueError(
            "checkpoint_dir requires checkpoint=True — with "
            "checkpoint=False nothing is ever checkpointed, so the "
            "reliable fault-tolerant mode the directory requests "
            "cannot exist")
    _ckpt = make_checkpointer(pairs.sparkSession, checkpoint_dir)
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    labels = edges.select(F.col("src").alias("node")).distinct() \
                  .withColumn("component", F.col("node"))
    #: `snap` is the CHECKPOINTED frame backing the current `labels`
    #: (release_checkpoint needs the LogicalRDD root, and from r18
    #: `labels` may be a projection over it)
    snap = None
    if checkpoint:
        edges = _ckpt(edges)
        labels = snap = _ckpt(labels)
    # MERGE hints throughout: the label and edge tables are both
    # pair-graph-scale (millions of rows on a real corpus), so a
    # stats-driven broadcast of either side is a scale hazard
    changing_rounds = 0
    converged = False
    try:
        for _ in range(max_iter):
            neigh = (
                edges.hint("merge").join(labels, edges.dst == labels.node)
                .groupBy("src").agg(F.min("component").alias("_nmin"))
            )
            # the round's OLD component rides along as `_prev` so the
            # convergence check below is a plain filter over the
            # checkpointed frame (r18, guide §2.4): the former
            # nxt-join-labels-on-node check re-shuffled BOTH label
            # snapshots every round (checkpointed RDDs surface no
            # partitioning to the planner) and cost a full extra job
            nxt = (
                labels.hint("merge")
                .join(neigh, labels.node == neigh.src, "left")
                .select(
                    "node",
                    F.least(F.col("component"),
                            F.coalesce(F.col("_nmin"), F.col("component")))
                    .alias("component"),
                    F.col("component").alias("_prev"),
                )
            )
            if checkpoint:
                nxt = _ckpt(nxt)
            changed = (
                nxt.filter(F.col("component") != F.col("_prev"))
                .limit(1).count()
            )
            prev_snap = snap
            snap = nxt if checkpoint else None
            labels = nxt.select("node", "component")
            # nxt is materialized (checkpoints are eager), so the
            # previous round's snapshot has no reader left — release it
            # now so k rounds never pin k label snapshots;
            # reliable-checkpoint files are ContextCleaner's job instead
            if (checkpoint and checkpoint_dir is None
                    and prev_snap is not None):
                release_checkpoint(prev_snap)
            if changed == 0:
                converged = True
                break
            changing_rounds += 1
            if (require_convergence_within is not None
                    and changing_rounds > require_convergence_within):
                raise ConvergenceError(
                    f"label propagation still changing after "
                    f"{require_convergence_within} rounds; the pair "
                    "graph's diameter exceeds the caller's pinned unroll")
        else:
            # the for-loop exhausted max_iter while labels were STILL
            # changing — a guard set at >= max_iter must fail loudly
            # too, not hand back unconverged labels
            if require_convergence_within is not None:
                raise ConvergenceError(
                    f"label propagation did not converge within "
                    f"max_iter={max_iter} rounds (convergence guard "
                    f"{require_convergence_within} requested)")
            # no guard: the documented max_iter bound applies, but the
            # labels are UNCONVERGED — two members of one duplicate
            # cluster may carry different canonical ids. Say so: a
            # silent partial merge reads exactly like a converged one
            _log.warning(
                "neardup_components: labels still changing after "
                "max_iter=%d rounds — returning PARTIALLY merged "
                "components (a chain-shaped pair graph deeper than "
                "max_iter); raise max_iter or pass "
                "require_convergence_within to fail loudly instead",
                max_iter)
            converged = True  # keep the returned snapshot un-released
    finally:
        # the raise paths must not leak storage either: the edge
        # snapshot has no reader past this function, and on failure the
        # last label snapshot is unreachable to the caller too — a
        # retried call would otherwise pin graph-scale state per attempt
        if checkpoint and checkpoint_dir is None:
            release_checkpoint(edges)
            if not converged and snap is not None:
                release_checkpoint(snap)
    return labels


def canonical_docs(pairs: DataFrame, docs: DataFrame,
                   id_col: str = "doc_id", id_a: str = "doc_a",
                   id_b: str = "doc_b") -> DataFrame:
    """Dedup policy applied: every doc keeps its cluster's canonical
    (min) id; docs in no pair are their own canonical."""
    comp = neardup_components(pairs, id_a, id_b)
    return (
        docs.hint("merge").join(comp, docs[id_col] == comp.node, "left")
        .select(
            docs["*"],
            F.coalesce(F.col("component"), docs[id_col]).alias("canonical_id"),
        )
    )
