"""End-to-end integration of the incremental-maintenance suite — the
composed story a steady-state 100 TB pipeline runs every cycle:

    fingerprint the corpus -> diff vs the last snapshot -> refresh the
    materialized partials from ONLY the touched partitions -> apply a
    CDC batch to a serving table with MERGE -> gate promotion with
    declarative quality rules -> read the skew report for the next run.

Two full cycles over a hive-partitioned parquet corpus, with the cycle-2
mutation touching a strict subset of partitions. Every intermediate is
checked against a from-scratch rebuild, and the refresh's rebuild scan
is asserted to be statically partition-pruned to the touched days.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fstd2pandas_spark.operators.validation import table_quality_report
from fstd2pandas_spark.plans.incremental import (
    incremental_refresh, partial_aggregates, reduce_partials)
from fstd2pandas_spark.plans.merge import merge_upsert
from fstd2pandas_spark.plans.salting import key_skew_report
from fstd2pandas_spark.plans.snapshot import (
    changed_partitions, partition_fingerprints)


def test_full_maintenance_cycle(spark, tmp_path):
    schema = "day string, k long, v long"
    v1 = [(f"d{i % 4}", i, (i * 7) % 50) for i in range(80)]
    spark.createDataFrame(v1, schema).write \
        .partitionBy("day").parquet(str(tmp_path / "v1"))
    c1 = spark.read.parquet(str(tmp_path / "v1"))

    # ---- cycle 1 (bootstrap): snapshot + full partials build
    snap1 = partition_fingerprints(c1, ["day"], ["k", "v"])
    partials1 = partial_aggregates(c1, ["day"], ["k"], ["v"])

    # ---- corpus v2: d1 values shift (same row count), d3 dropped,
    # d9 appears, d0/d2 untouched
    v2 = ([(d, k, v + (5 if d == "d1" else 0))
           for d, k, v in v1 if d != "d3"]
          + [("d9", 900 + j, j) for j in range(5)])
    spark.createDataFrame(v2, schema).write \
        .partitionBy("day").parquet(str(tmp_path / "v2"))
    c2 = spark.read.parquet(str(tmp_path / "v2"))

    # ---- cycle 2: diff, refresh, reduce
    snap2 = partition_fingerprints(c2, ["day"], ["k", "v"])
    diff = changed_partitions(snap2, snap1, ["day"])
    assert {r["day"]: r["status"] for r in diff.collect()} == \
        {"d1": "changed", "d3": "deleted", "d9": "new"}
    partials2 = incremental_refresh(c2, partials1, diff,
                                    ["day"], ["k"], ["v"])
    assert {tuple(r) for r in partials2.collect()} == {
        tuple(r) for r in
        partial_aggregates(c2, ["day"], ["k"], ["v"]).collect()}
    # the rebuild scan is statically pruned to the touched days only
    plan = partials2._jdf.queryExecution().executedPlan().toString()
    pruned = [ln for ln in plan.splitlines()
              if "PartitionFilters" in ln and "d1" in ln and "d9" in ln]
    assert pruned and all("d0" not in ln for ln in pruned), plan
    agg2 = reduce_partials(partials2, ["k"], ["v"])

    # ---- serve: MERGE a CDC batch into the reduced table
    serving = agg2.select("k", "n_rows", F.col("sum_v").alias("total"))
    cdc = spark.createDataFrame(
        [(0, 99, 999, 1, False),      # update k=0
         (1, 0, 0, 1, True),          # tombstone k=1
         (5000, 1, 42, 1, False)],    # insert
        "k long, n_rows long, total long, ver long, del boolean")
    served = merge_upsert(serving, cdc, ["k"],
                          version_col="ver", delete_col="del")
    rows = {r["k"]: (r["n_rows"], r["total"]) for r in served.collect()}
    assert rows[0] == (99, 999) and rows[5000] == (1, 42)
    assert 1 not in rows
    base = {r["k"]: (r["n_rows"], r["total"])
            for r in serving.collect()}
    assert all(rows[k] == base[k] for k in rows if k not in (0, 5000))

    # ---- promote: quality gate over the served table (strict)
    report = table_quality_report(
        served,
        [("uq", "k", "unique"), ("nn", "k", "not_null"),
         ("pos", "n_rows", "min", 0)],
        strict=True).collect()
    assert all(r["passed"] for r in report)
    # a broken table fails promotion loudly
    broken = served.unionByName(served.limit(1))
    with pytest.raises(Exception, match="strict mode"):
        table_quality_report(broken, [("uq", "k", "unique")],
                             strict=True).collect()

    # ---- audit the promotion: the row-level change feed between the
    # pre- and post-MERGE serving states must recover EXACTLY the CDC
    # batch's effects (the Delta CDF read, log-free), and replaying
    # its post-images + deletes through merge_upsert lands back on the
    # served table — the downstream-consumer contract
    from fstd2pandas_spark.plans.merge import change_feed

    feed = change_feed(serving, served, ["k"])
    by_type: dict = {}
    for r in feed.collect():
        by_type.setdefault(r["_change_type"], set()).add(r["k"])
    assert by_type == {"update_preimage": {0}, "update_postimage": {0},
                       "insert": {5000}, "delete": {1}}
    replay_src = (feed.filter(F.col("_change_type") != "update_preimage")
                  .withColumn("_del",
                              F.col("_change_type") == "delete")
                  .drop("_change_type"))
    assert {tuple(r) for r in merge_upsert(
        serving, replay_src, ["k"], delete_col="_del").collect()} == \
        {tuple(r) for r in served.collect()}

    # ---- dimension history: SCD2 the serving table's first two
    # states, then point-in-time-join facts against it
    from fstd2pandas_spark.plans.merge import scd2_apply, scd2_lookup

    h0 = (serving.withColumn("valid_from", F.lit(0).cast("long"))
          .withColumn("valid_to", F.lit(None).cast("long")))
    dbatch = cdc.withColumnRenamed("ver", "_v") \
        .withColumn("_v", F.lit(5).cast("long"))
    h1 = scd2_apply(h0, dbatch, ["k"], "_v", delete_col="del")
    fct = spark.createDataFrame([(0, 2), (0, 7), (1, 7), (5000, 7)],
                                "k long, t long")
    pit = {(r["k"], r["t"]): r["dim_total"] for r in
           scd2_lookup(fct, h1, ["k"], "t").collect()}
    assert pit[(0, 2)] == base[0][1]       # pre-change version
    assert pit[(0, 7)] == 999              # post-change version
    assert pit[(1, 7)] is None             # tombstoned at 5
    assert pit[(5000, 7)] == 42            # inserted at 5

    # ---- plan the next run: skew diagnosis over the new corpus
    skew = key_skew_report(c2.select("day"), ["day"], top_k=2) \
        .orderBy("rank").collect()
    assert [(r["day"], r["n_rows"], r["rank"]) for r in skew] == \
        [("d0", 20, 1), ("d1", 20, 2)]   # tie broken by key ascending

    # ---- compact: the cycle's refresh rewrites and MERGE batches
    # leave small-file debris behind (simulated here by landing the
    # v2 corpus in three append passes — each pass drops its own
    # files into every partition); OPTIMIZE bin-packs the fragmented
    # partitions back to one file each while the order-free
    # fingerprints certify content invariance, so the NEXT cycle's
    # diff sees no phantom changes from the layout rewrite.
    from fstd2pandas_spark.plans.compaction import (
        compact_partitions, compaction_plan)

    fact = str(tmp_path / "fact")
    for m in range(3):
        c2.filter(F.col("k") % 3 == m).write \
            .partitionBy("day").mode("append").parquet(fact)
    pre_snap = partition_fingerprints(
        spark.read.parquet(fact), ["day"], ["k", "v"]).localCheckpoint()
    plan0 = compaction_plan(spark, fact, ["day"], 1 << 30)
    assert sorted(e["rel"] for e in plan0) == \
        ["day=d0", "day=d1", "day=d2", "day=d9"]
    assert all(e["n_files"] >= 2 and e["needs"] for e in plan0)
    stats = compact_partitions(spark, fact, ["day"], 1 << 30,
                               verify=True)
    assert stats["files_after"] == 4 < stats["files_before"]
    assert all(e["n_files"] == 1 for e in
               compaction_plan(spark, fact, ["day"], 1 << 30))
    # checkpointed: the expiry below DELETES files this lazy scan's
    # captured listing references — the snapshot must be pinned to
    # the pre-expiry state it claims to be
    post_snap = partition_fingerprints(
        spark.read.parquet(fact), ["day"], ["k", "v"]).localCheckpoint()
    assert changed_partitions(post_snap, pre_snap, ["day"]).count() == 0

    # ---- expire: retention drops the oldest day as a metadata-plane
    # op, and the NEXT cycle's diff must report exactly that partition
    # as 'deleted' — the signal downstream incremental consumers
    # (refresh, partial-aggregate maintenance) react to by dropping
    # their partials for it, closing the retention loop end to end.
    from fstd2pandas_spark.plans.compaction import expire_partitions

    est = expire_partitions(spark, fact, ["day"],
                            lambda v: v["day"] == "d0")
    assert est["expired"] == ["day=d0"] and est["files_removed"] == 1
    exp_snap = partition_fingerprints(
        spark.read.parquet(fact), ["day"], ["k", "v"])
    exp_diff = changed_partitions(exp_snap, post_snap, ["day"])
    assert [(r["day"], r["status"]) for r in exp_diff.collect()] == \
        [("d0", "deleted")]
    # the surviving partitions are byte-identical and still compact
    assert all(e["n_files"] == 1 for e in
               compaction_plan(spark, fact, ["day"], 1 << 30))
