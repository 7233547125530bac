"""Scale validation of the r19 apply_mask pair-fold (OPTIMIZATION_r19
row 2): the fold's plan win (20 -> 14 Exchange, join/window/sort
eliminated, masked lineage planned once) was wall-clock-equal at sf0.1,
so run the OLD (windowed merge self-join) and NEW (groupBy fold)
implementations same-process, interleaved, on a ~10x synthetic var+mask
corpus and record wall clock + shuffle bytes.

Usage: python tools/ab_mask_scale.py [n_pairs] [arr_len] [rounds]
The synthetic lives in /tmp (never committed); the old implementation
is loaded from the pre-025a110 mask module extracted from git.
"""
from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fstd2pandas_spark.session import get_spark

N_PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
ARR_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 24
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
DATA = f"/tmp/scale_ab/mask_{N_PAIRS}x{ARR_LEN}.parquet"
OLD_MOD = "/tmp/scale_ab/mask_old.py"


def load_old():
    if not os.path.exists(OLD_MOD):
        os.makedirs("/tmp/scale_ab", exist_ok=True)
        src = subprocess.check_output(
            ["git", "show", "025a110~1:fstd2pandas_spark/operators/mask.py"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        with open(OLD_MOD, "wb") as f:
            f.write(src)
    spec = importlib.util.spec_from_file_location("mask_old", OLD_MOD)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def synth(spark):
    if os.path.exists(os.path.join(DATA, "_SUCCESS")):
        return
    # one well-formed (var, mask) pair per id; keys vary so the pairing
    # exchange is real; d arrays deterministic, mask ~70% keep
    base = spark.range(N_PAIRS).select(
        F.expr("element_at(array('TT','UU','VV','HU','GZ'), "
               "cast(pmod(id, 5) + 1 as int))").alias("nomvar"),
        F.expr("concat('R', cast(pmod(id, 7) as string), '_ETIKET')"
               ).alias("etiket"),
        F.lit(ARR_LEN).cast("long").alias("ni"),
        F.lit(1).cast("long").alias("nj"),
        F.lit(1).cast("long").alias("nk"),
        F.lit(442998800).cast("long").alias("dateo"),
        F.col("id").alias("ip1"),
        F.expr("pmod(id, 24)").alias("ip2"),
        F.lit(0).cast("long").alias("ip3"),
        F.lit(300).cast("long").alias("deet"),
        F.lit(0).cast("long").alias("npas"),
        F.lit("Z").alias("grtyp"),
        F.expr("pmod(id, 100)").alias("ig1"),
        F.lit(22).cast("long").alias("ig2"),
        F.lit(0).cast("long").alias("ig3"),
        F.lit(0).cast("long").alias("ig4"),
        F.lit(443004200).cast("long").alias("datev"),
        F.expr("cast(pmod(id, 1000) as string)").alias("grid"),
        F.expr(f"transform(sequence(1, {ARR_LEN}), "
               "j -> cast(pmod(hash(id, j), 1000) as float) / 10.0)"
               ).alias("_dv"),
        F.expr(f"transform(sequence(1, {ARR_LEN}), "
               "j -> cast(cast(pmod(hash(id, j, 3), 10) < 7 as int) "
               "as float))").alias("_dm"),
    )
    var = base.select("*", F.lit("P@").alias("typvar"),
                      F.lit(134).cast("long").alias("datyp"),
                      F.lit(16).cast("long").alias("nbits"),
                      F.col("_dv").alias("d")).drop("_dv", "_dm")
    mask = base.select("*", F.lit("@@").alias("typvar"),
                       F.lit(2).cast("long").alias("datyp"),
                       F.lit(1).cast("long").alias("nbits"),
                       F.col("_dm").alias("d")).drop("_dv", "_dm")
    cols = ["nomvar", "typvar", "etiket", "ni", "nj", "nk", "dateo",
            "ip1", "ip2", "ip3", "deet", "npas", "datyp", "nbits",
            "grtyp", "ig1", "ig2", "ig3", "ig4", "datev", "grid", "d"]
    var.select(cols).unionByName(mask.select(cols)) \
        .write.mode("overwrite").parquet(DATA)


def stages(app_id, port):
    url = (f"http://localhost:{port}/api/v1/applications/{app_id}"
           "/stages?status=complete")
    return json.load(urllib.request.urlopen(url))


def max_stage(app_id, port):
    return max((s["stageId"] for s in stages(app_id, port)), default=-1)


def shuffle_bytes_since(app_id, port, after):
    return sum(s["shuffleWriteBytes"] for s in stages(app_id, port)
               if s["stageId"] > after)


def main():
    spark = get_spark("ab_mask_scale",
                      extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    port = sc.uiWebUrl.rsplit(":", 1)[1]
    app_id = sc.applicationId
    synth(spark)
    df = spark.read.parquet(DATA)
    old = load_old()
    import fstd2pandas_spark.operators.mask as new

    variants = {"new": new.apply_mask, "old": old.apply_mask}
    a, b = variants["new"](df), variants["old"](df)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"value check: exceptAll diff rows = {diff} "
          f"(rows: {a.count()})")
    assert diff == 0

    results = {k: [] for k in variants}
    sbytes = {k: [] for k in variants}
    for r in range(ROUNDS):
        for k in ("new", "old") if r % 2 == 0 else ("old", "new"):
            out = variants[k](df)
            sc.setJobDescription(f"mask-{k}-r{r}")
            before = max_stage(app_id, port)
            t0 = time.perf_counter()
            out.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sb = shuffle_bytes_since(app_id, port, before)
            results[k].append(dt)
            sbytes[k].append(sb)
            print(f"round {r} {k}: {dt:.2f} s, shuffle {sb:,} B")
    for k in variants:
        print(f"{k}: min {min(results[k]):.2f} s, "
              f"shuffle {min(sbytes[k]):,} B over {N_PAIRS:,} pairs")


if __name__ == "__main__":
    main()
