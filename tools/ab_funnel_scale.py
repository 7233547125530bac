"""Scale validation of the r18 funnel-fold shuffle diet (r19, VERDICT
item 4): the -45% shuffle-byte win was plan-true but wall-clock
invisible at sf0.1, so run the OLD (r17) and NEW (r18) folds
same-process, interleaved, on a ~20x synthetic events table and record
wall clock + shuffle bytes.

Usage: python tools/ab_funnel_scale.py [n_rows] [rounds]
The synthetic lives in /tmp (never committed); the old fold is loaded
from the pre-2b45fa1 funnel module extracted to /tmp/scale_ab/.
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

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
DATA = f"/tmp/scale_ab/events_{N_ROWS}.parquet"
OLD_MOD = "/tmp/scale_ab/funnel_old.py"
STEPS = ["view", "click", "purchase"]


def load_old():
    if not os.path.exists(OLD_MOD):
        os.makedirs("/tmp/scale_ab", exist_ok=True)
        src = subprocess.check_output(
            ["git", "show", "2b45fa1~1:fstd2pandas_spark/operators/funnel.py"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        with open(OLD_MOD, "wb") as f:
            f.write(src)
    spec = importlib.util.spec_from_file_location("funnel_old", OLD_MOD)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def synth(spark):
    if os.path.exists(os.path.join(DATA, "_SUCCESS")):
        return
    # ~60% step-typed events, ~40% noise types + 2% NULL type, ~5% NULL
    # ts — the sf0.1 mix the diet targets, deterministic via hash(id)
    types = ("view,click,purchase,browse,scroll,hover,browse,scroll,"
             "view,click").split(",")
    arr = ", ".join(f"'{t}'" for t in types)
    (spark.range(N_ROWS)
     .select(
         F.col("id").alias("event_id"),
         F.expr("CASE WHEN pmod(hash(id, 7), 20) = 0 THEN NULL ELSE "
                "timestamp_micros(1600000000000000 + cast(pmod(hash(id, 1), "
                "2592000) as bigint) * 1000000) END").alias("ts"),
         F.expr(f"pmod(hash(id, 3), {max(N_ROWS // 20, 1)})").alias("user_id"),
         F.expr(f"CASE WHEN pmod(hash(id, 11), 50) = 0 THEN NULL ELSE "
                f"element_at(array({arr}), "
                f"cast(pmod(hash(id, 5), 10) + 1 as int)) END"
                ).alias("event_type"),
     )
     .write.mode("overwrite").parquet(DATA))


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
    spark = get_spark("ab_funnel_scale",
                      extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    port = sc.uiWebUrl.rsplit(":", 1)[1]
    app_id = sc.applicationId
    synth(spark)
    ev = spark.read.parquet(DATA)
    old = load_old()
    import fstd2pandas_spark.operators.funnel as new

    variants = {"new": new.funnel_steps, "old": old.funnel_steps}
    # value equality first (the diet's exactness claim at this scale)
    a = variants["new"](ev, STEPS, within=86_400_000_000)
    b = variants["old"](ev, STEPS, within=86_400_000_000)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"value check: exceptAll diff rows = {diff}")
    assert diff == 0

    results = {k: [] for k in variants}
    sbytes = {k: [] for k in variants}
    for r in range(ROUNDS):
        for k in ("new", "old") if r % 2 == 0 else ("old", "new"):
            df = variants[k](ev, STEPS, within=86_400_000_000)
            sc.setJobDescription(f"funnel-{k}-r{r}")
            before = max_stage(app_id, port)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sb = shuffle_bytes_since(app_id, port, before)
            results[k].append(dt)
            sbytes[k].append(sb)
            print(f"round {r} {k}: {dt:.2f} s, shuffle {sb:,} B")
    for k in variants:
        print(f"{k}: min {min(results[k]):.2f} s, "
              f"shuffle {min(sbytes[k]):,} B over {N_ROWS:,} rows")


if __name__ == "__main__":
    main()
