"""Time every registry query once (count) at a given SF — outlier finder
for optimization rounds. Not a benchmark: single cold run per query,
shared session/caches, intended to rank relative cost and spot
regressions, not to produce citable absolute numbers.

Usage: python scripts/sweep_all_queries.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]
    import filodb_spark
    from filodb_spark.driver_queries import all_queries
    spark = filodb_spark.get_spark("sweep-all")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = all_queries()
    out = []
    t_all = time.time()
    for name, fn in queries.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
            err = ""
        except Exception as exc:
            n, err = -1, f" ERR {type(exc).__name__}: {exc}"
        dt = time.time() - t0
        out.append((dt, name, n, err))
        print(f"{dt:7.2f}s {name} rows={n}{err}", flush=True)
    print(f"# total {time.time() - t_all:.1f}s")
    print("# slowest 25:")
    for dt, name, n, err in sorted(out, reverse=True)[:25]:
        print(f"#  {dt:7.2f}s {name}")


if __name__ == "__main__":
    main()
