"""Dump .explain("formatted") plans for named queries to files.

Usage: python tools/dump_plan_files.py <outdir> <suffix> <query> [query...]
e.g.   python tools/dump_plan_files.py plans/r19 before emb_ann_ivf
Writes <outdir>/<query>_<suffix>.txt at sf0.001 (the r18 convention).
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from fstd2pandas_spark.session import get_spark


def main():
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plan_files")
    qs = dict(entry.queries())
    qs["fst_mask"] = entry.q_fst_mask
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
