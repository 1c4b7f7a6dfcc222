"""Interleaved A/B for the r14 compile-path memo (_scan_sk) + lazy lab
frame: same engine, same queries, memo enabled vs disabled
(eng._scan_memo = {} / None), alternating. Times BUILD (query_range
call, pure driver py4j+analysis) and END-TO-END (build + count) per
query. Mirrors bench.py's prom_shape_bench store so the numbers map to
the bench's prom_* entries.

Usage: python scripts/ab_scan_memo.py [--runs 15]
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
    ap.add_argument("--runs", type=int, default=15)
    args = ap.parse_args()

    import filodb_spark
    from filodb_spark.promql import PromQLEngine
    from filodb_spark.promql.compiler import TsStore

    spark = filodb_spark.get_spark("ab-scan-memo")
    spark.sparkContext.setLogLevel("ERROR")

    t0_ms = 1_700_000_000_000
    rows = []
    for s in range(100):
        labels = {"__name__": "heap_usage0", "_ws_": "demo",
                  "_ns_": f"App-{s % 8}", "instance": str(s)}
        for i in range(720):
            v = 50 + 30 * math.sin(2 * math.pi * i / 90) + ((s * 7 + i) % 13) / 6.5
            rows.append((labels, t0_ms + i * 10_000, float(v)))
    df = spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double").cache()
    df.count()
    eng = PromQLEngine(spark, TsStore(df))
    end = t0_ms + 720 * 10_000
    start = end - 55 * 60_000
    queries = {
        "prom_raw": 'heap_usage0{_ws_="demo",_ns_="App-2"}',
        "prom_sum_over_time":
            'sum_over_time(heap_usage0{_ws_="demo",_ns_="App-2"}[5m])',
        "prom_sum_rate": 'sum(rate(heap_usage0{_ws_="demo"}[5m]))',
        "prom_quantile": 'quantile(0.75, heap_usage0{_ws_="demo"})',
    }

    # row-equality with the memo on vs off, per query
    for name, q in queries.items():
        eng._scan_memo = {}
        on = {(tuple(sorted(r["labels"].items())), r["t"], repr(r["value"]))
              for r in eng.query_range(q, start, end, 150_000).collect()}
        eng._scan_memo = None
        off = {(tuple(sorted(r["labels"].items())), r["t"], repr(r["value"]))
               for r in eng.query_range(q, start, end, 150_000).collect()}
        assert on == off, name
        print(f"# equality OK {name}: {len(on)} rows")

    # warm both arms
    for arm in ({}, None):
        eng._scan_memo = arm
        for q in queries.values():
            eng.query_range(q, start, end, 150_000).count()

    build = {(n, a): [] for n in queries for a in ("memo", "nomemo")}
    e2e = {(n, a): [] for n in queries for a in ("memo", "nomemo")}
    for _ in range(args.runs):
        for arm, store in (("memo", {}), ("nomemo", None)):
            eng._scan_memo = store
            for name, q in queries.items():
                if arm == "memo":
                    # pre-populate once so the timed run measures the
                    # steady-state (hit) path the bench actually sees
                    eng.query_range(q, start, end, 150_000)
                t0 = time.perf_counter()
                out = eng.query_range(q, start, end, 150_000)
                t1 = time.perf_counter()
                out.count()
                t2 = time.perf_counter()
                build[(name, arm)].append(t1 - t0)
                e2e[(name, arm)].append(t2 - t0)
    for name in queries:
        bm = statistics.median(build[(name, "memo")]) * 1000
        bn = statistics.median(build[(name, "nomemo")]) * 1000
        em = statistics.median(e2e[(name, "memo")])
        en = statistics.median(e2e[(name, "nomemo")])
        print(f"{name}: build {bn:.0f} -> {bm:.0f} ms | "
              f"e2e {en:.3f} -> {em:.3f} s")


if __name__ == "__main__":
    main()
