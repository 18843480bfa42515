"""Dump `.explain("formatted")` for named driver queries to plans/r06/.

Usage: python tools/dump_plan_r06.py <suffix> [query1,query2,...]
  suffix: "before" or "after" (file name becomes plans/r06/<query>_<suffix>.txt)
  queries: comma list; default = all queries()

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    import __spark_entry__ as entry

    from exactextractr_spark.session import get_spark

    suffix = sys.argv[1]
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plans-r06", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # keep going; record the failure
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
