"""Driver-harness replica for cross-round adjudication (the r17/r18
events_hourly playbook): bench.py's exact shape — same session config,
same sf0.001 warmup order, same min-of-3 policy — looped N full
HEADLINE cycles in ONE JVM, printing per-cycle minima and per-iteration
raw timings for the queries under adjudication. Identical code across
cycles, so the spread IS the same-JVM noise floor.

Usage: python tools/bench_cycles.py [cycles] [query ...]
(default 3 cycles, all HEADLINE queries; named queries get their raw
per-iteration timings printed too)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, _calibration


def main() -> None:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    watch = set(sys.argv[2:]) or set(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from fstd2pandas_spark.session import get_spark

    spark = get_spark("bench_cycles")
    qs = dict(entry_mod.queries())
    qs["fst_mask"] = entry_mod.q_fst_mask

    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        try:
            qs[name](spark, warm_dir).count()
        except Exception:
            pass

    for c in range(cycles):
        timings: dict[str, float] = {}
        raw: dict[str, list[float]] = {}
        for name in HEADLINE:
            fn = qs[name]
            its = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                its.append(round(time.perf_counter() - t0, 3))
            timings[name] = min(its)
            if name in watch:
                raw[name] = its
        print(json.dumps({"cycle": c, "min3": timings, "raw": raw,
                          "calib": _calibration(spark)}))


if __name__ == "__main__":
    main()
