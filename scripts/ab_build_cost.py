"""Build-only microbench for the r13 final pass (driver-side analysis cost).

Times N fresh builds (NO action) of the prom bench queries and the
aggregate kernel — the paths touched by the single-agg / fused-matcher /
withColumns change. Build time is single-threaded driver work (py4j +
Catalyst analysis), so it isolates exactly what the change claims to cut
and is far less sensitive to the box's executor-side noise than count().

Usage: python scripts/ab_build_cost.py [--n 20]
"""

from __future__ import annotations

import argparse
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    import filodb_spark
    from filodb_spark.promql import PromQLEngine
    from filodb_spark.promql.compiler import TsStore

    spark = filodb_spark.get_spark("filodb-spark-ab-build")
    spark.sparkContext.setLogLevel("ERROR")

    t0_ms = 1_700_000_000_000
    rows = []
    for s in range(20):
        labels = {"__name__": "heap_usage0", "_ws_": "demo",
                  "_ns_": f"App-{s % 8}", "instance": str(s)}
        for i in range(60):
            v = 50 + 30 * math.sin(2 * math.pi * i / 90)
            rows.append((labels, t0_ms + i * 10_000, float(v)))
    df = spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double").cache()
    df.count()
    eng = PromQLEngine(spark, TsStore(df))
    end = t0_ms + 60 * 10_000
    start = end - 55 * 60_000

    queries = {
        "prom_raw": 'heap_usage0{_ws_="demo",_ns_="App-2"}',
        "prom_sum_over_time":
            'sum_over_time(heap_usage0{_ws_="demo",_ns_="App-2"}[5m])',
        "prom_sum_rate": 'sum(rate(heap_usage0{_ws_="demo"}[5m]))',
        "prom_quantile": 'quantile(0.75, heap_usage0{_ws_="demo"})',
        "prom_count_by": 'count(heap_usage0) by (_ns_)',
    }
    for q in queries.values():                       # warm memos/codepaths
        eng.query_range(q, start, end, 150_000)

    print("# name build_median_s over", args.n, "fresh builds (no action)")
    for name, q in queries.items():
        times = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            eng.query_range(q, start, end, 150_000)
            times.append(time.perf_counter() - t0)
        print(f"{name} {statistics.median(times):.4f} "
              f"(min {min(times):.4f})")

    # the aggregate kernel in isolation: one groupBy().agg() vs the old
    # groupBy().agg().select() chain — 20 fresh builds over a tiny frame
    from filodb_spark.kernels import aggregations as agg_k
    base = spark.createDataFrame(
        [("a", 1, 1.0)], "g string, t long, value double")
    for op in ("sum", "count", "group", "quantile"):
        times = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            agg_k.aggregate(base, op, ["g"],
                            params=(0.5,) if op == "quantile" else ())
            times.append(time.perf_counter() - t0)
        print(f"aggregate[{op}] {statistics.median(times):.4f} "
              f"(min {min(times):.4f})")


if __name__ == "__main__":
    main()
